"""Convert the reference's ORBvoc.txt to the fast npz format.

Usage: python examples/convert_vocab.py ORBvoc.txt ORBvoc.npz

The reference re-parses the ~140MB text file on every startup
(`src/System.cc:58-77`, "this could take a while"); converting once makes
vocabulary loading instant. Pass the npz to SlamSystem via
`bow.vocabulary.load_npz`.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orb_slam2_tpu.bow import vocabulary


def main():
    src, dst = sys.argv[1], sys.argv[2]
    t0 = time.time()
    voc = vocabulary.load_orb_vocabulary(src)
    print(f"parsed {voc.n_words} words ({voc.n_nodes} nodes) "
          f"in {time.time() - t0:.1f}s")
    vocabulary.save_npz(voc, dst)
    t0 = time.time()
    vocabulary.load_npz(dst)
    print(f"npz reload: {time.time() - t0:.2f}s -> {dst}")


if __name__ == "__main__":
    main()
