"""Plain-NumPy oracle implementations of the ORB kernels, written directly
from the algorithm definitions (FAST-9-16, intensity centroid, steered BRIEF).
Slow and loopy on purpose — these validate the vectorized JAX ops."""
import numpy as np

CIRCLE = [
    (0, -3), (1, -3), (2, -2), (3, -1),
    (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]

HALF_PATCH = 15


def fast_score(img, y, x):
    """Max threshold t such that (y,x) passes FAST-9-16 at t."""
    p = float(img[y, x])
    d = np.array([float(img[y + dy, x + dx]) for dx, dy in CIRCLE])
    best = -np.inf
    for sign in (+1, -1):
        diffs = sign * (d - p)
        for k in range(16):
            window = [diffs[(k + i) % 16] for i in range(9)]
            best = max(best, min(window))
    return best


def umax_table():
    umax = np.zeros(HALF_PATCH + 1, dtype=np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(np.round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


def ic_angle(img, y, x):
    """Intensity-centroid angle in degrees [0,360)."""
    umax = umax_table()
    m10 = 0.0
    m01 = 0.0
    for u in range(-HALF_PATCH, HALF_PATCH + 1):
        m10 += u * float(img[y, x + u])
    for v in range(1, HALF_PATCH + 1):
        d = umax[v]
        v_sum = 0.0
        for u in range(-d, d + 1):
            vp = float(img[y + v, x + u])
            vm = float(img[y - v, x + u])
            v_sum += vp - vm
            m10 += u * (vp + vm)
        m01 += v * v_sum
    ang = np.degrees(np.arctan2(m01, m10))
    return ang + 360.0 if ang < 0 else ang


def steered_brief(img_blur, y, x, angle_deg, pattern):
    """256-bit descriptor as (8,) uint32, same packing as the JAX op."""
    theta = np.radians(angle_deg)
    a, b = np.cos(theta), np.sin(theta)
    bits = []
    for i in range(256):
        x0, y0, x1, y1 = (float(v) for v in pattern[i])

        def val(px, py):
            dy = int(np.round(px * b + py * a))
            dx = int(np.round(px * a - py * b))
            return float(img_blur[y + dy, x + dx])

        bits.append(1 if val(x0, y0) < val(x1, y1) else 0)
    words = np.zeros(8, dtype=np.uint32)
    for i, bit in enumerate(bits):
        if bit:
            words[i // 32] |= np.uint32(1) << np.uint32(i % 32)
    return words


def gaussian_blur9(img, sigma=2.0):
    """Separable 9x9 Gaussian, reflect-101 border."""
    xs = np.arange(9) - 4.0
    k = np.exp(-(xs ** 2) / (2 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(img.astype(np.float64), 4, mode="reflect")
    tmp = np.zeros_like(pad)
    for i in range(pad.shape[0]):
        tmp[i] = np.convolve(pad[i], k, mode="same")
    out = np.zeros_like(tmp)
    for j in range(pad.shape[1]):
        out[:, j] = np.convolve(tmp[:, j], k, mode="same")
    return out[4:-4, 4:-4]


def hamming(d1, d2):
    return int(np.sum([bin(int(a) ^ int(b)).count("1") for a, b in zip(d1, d2)]))
