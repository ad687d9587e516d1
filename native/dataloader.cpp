// Native dataset loader: multi-threaded image decode with in-order
// prefetching ring buffer.
//
// The reference's example drivers block on cv::imread for every frame
// (Examples/Monocular/mono_tum.cc:86-97); at TPU tracking rates (>1000 fps
// per chip) host-side decode becomes the bottleneck, so this loader decodes
// ahead on worker threads and hands frames to Python in order through a
// fixed ring of slots. Supports 8/16-bit grayscale + RGB PNG (libpng) and
// PGM/PPM. Exposed through a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O2 -shared -fPIC dataloader.cpp -o libslamloader.so -lpng -lz -lpthread
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint16_t> data;  // always widened to u16 (depth pngs are u16)
  int width = 0;
  int height = 0;
  int channels = 0;
  int bit_depth = 8;
  bool ok = false;
};

bool decode_png(const std::string& path, Image* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int width = png_get_image_width(png, info);
  int height = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (depth == 16) png_set_swap(png);  // PNG is big-endian; host is little
  png_read_update_info(png, info);

  color = png_get_color_type(png, info);
  depth = png_get_bit_depth(png, info);
  int channels = (color == PNG_COLOR_TYPE_RGB) ? 3 : 1;

  std::vector<png_bytep> rows(height);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> raw(rowbytes * height);
  for (int y = 0; y < height; y++) rows[y] = raw.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  out->width = width;
  out->height = height;
  out->channels = channels;
  out->bit_depth = depth;
  out->data.resize(size_t(width) * height * channels);
  if (depth == 16) {
    memcpy(out->data.data(), raw.data(), out->data.size() * 2);
  } else {
    for (size_t i = 0; i < out->data.size(); i++) out->data[i] = raw[i];
  }
  out->ok = true;
  return true;
}

bool decode_pnm(const std::string& path, Image* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  char magic[3] = {0};
  if (fscanf(fp, "%2s", magic) != 1) { fclose(fp); return false; }
  int channels = (magic[1] == '6') ? 3 : 1;  // P5 gray, P6 rgb
  int w, h, maxv;
  // skip comments
  auto skip = [&]() {
    int c;
    while ((c = fgetc(fp)) != EOF) {
      if (c == '#') { while ((c = fgetc(fp)) != EOF && c != '\n') {} }
      else if (!isspace(c)) { ungetc(c, fp); return; }
    }
  };
  skip(); if (fscanf(fp, "%d", &w) != 1) { fclose(fp); return false; }
  skip(); if (fscanf(fp, "%d", &h) != 1) { fclose(fp); return false; }
  skip(); if (fscanf(fp, "%d", &maxv) != 1) { fclose(fp); return false; }
  fgetc(fp);  // single whitespace
  int depth = maxv > 255 ? 16 : 8;
  size_t n = size_t(w) * h * channels;
  out->data.resize(n);
  if (depth == 8) {
    std::vector<uint8_t> raw(n);
    if (fread(raw.data(), 1, n, fp) != n) { fclose(fp); return false; }
    for (size_t i = 0; i < n; i++) out->data[i] = raw[i];
  } else {
    std::vector<uint8_t> raw(n * 2);
    if (fread(raw.data(), 1, n * 2, fp) != n * 2) { fclose(fp); return false; }
    for (size_t i = 0; i < n; i++)
      out->data[i] = (uint16_t(raw[2 * i]) << 8) | raw[2 * i + 1];  // big-endian
  }
  fclose(fp);
  out->width = w;
  out->height = h;
  out->channels = channels;
  out->bit_depth = depth;
  out->ok = true;
  return true;
}

bool decode(const std::string& path, Image* out) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot);
  for (auto& c : ext) c = tolower(c);
  if (ext == ".png") return decode_png(path, out);
  if (ext == ".pgm" || ext == ".ppm" || ext == ".pnm") return decode_pnm(path, out);
  // try both
  return decode_png(path, out) || decode_pnm(path, out);
}

struct Loader {
  std::vector<std::string> paths;
  std::vector<Image> slots;
  std::vector<std::atomic<int>> state;  // 0=empty 1=decoding 2=ready
  std::atomic<size_t> next_decode{0};
  size_t next_consume = 0;
  size_t window = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::mutex mu;
  std::condition_variable cv;

  Loader(std::vector<std::string> p, int window_, int n_threads)
      : paths(std::move(p)),
        slots(paths.size()),
        state(paths.size()),
        window(window_) {
    for (auto& s : state) s.store(0);
    for (int t = 0; t < n_threads; t++) {
      workers.emplace_back([this] { worker(); });
    }
  }

  void worker() {
    while (!stop.load()) {
      size_t idx = next_decode.load();
      // only decode within the prefetch window of the consumer
      size_t limit;
      {
        std::lock_guard<std::mutex> l(mu);
        limit = next_consume + window;
      }
      if (idx >= paths.size()) break;
      if (idx >= limit) {
        std::unique_lock<std::mutex> l(mu);
        cv.wait_for(l, std::chrono::milliseconds(20));
        continue;
      }
      if (!next_decode.compare_exchange_strong(idx, idx + 1)) continue;
      state[idx].store(1);
      decode(paths[idx], &slots[idx]);
      state[idx].store(2);
      cv.notify_all();
    }
  }

  // blocking in-order fetch; returns false at end of dataset / failure
  bool next(uint16_t* out, int cap, int* w, int* h, int* c, int* bits) {
    if (next_consume >= paths.size()) return false;
    size_t idx = next_consume;
    {
      std::unique_lock<std::mutex> l(mu);
      cv.wait(l, [&] { return state[idx].load() == 2 || stop.load(); });
    }
    if (stop.load()) return false;
    Image& im = slots[idx];
    if (!im.ok) { next_consume++; return false; }
    size_t n = im.data.size();
    if ((int)n > cap) return false;
    memcpy(out, im.data.data(), n * 2);
    *w = im.width;
    *h = im.height;
    *c = im.channels;
    *bits = im.bit_depth;
    im.data.clear();
    im.data.shrink_to_fit();
    {
      std::lock_guard<std::mutex> l(mu);
      next_consume++;
    }
    cv.notify_all();
    return true;
  }

  ~Loader() {
    stop.store(true);
    cv.notify_all();
    for (auto& t : workers) t.join();
  }
};

}  // namespace

extern "C" {

void* slam_loader_create(const char** paths, int n, int window, int n_threads) {
  std::vector<std::string> p(paths, paths + n);
  return new Loader(std::move(p), window, n_threads);
}

int slam_loader_next(void* handle, uint16_t* out, int cap, int* w, int* h,
                     int* c, int* bits) {
  return static_cast<Loader*>(handle)->next(out, cap, w, h, c, bits) ? 1 : 0;
}

void slam_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

int slam_decode_one(const char* path, uint16_t* out, int cap, int* w, int* h,
                    int* c, int* bits) {
  Image im;
  if (!decode(path, &im)) return 0;
  if ((int)im.data.size() > cap) return 0;
  memcpy(out, im.data.data(), im.data.size() * 2);
  *w = im.width;
  *h = im.height;
  *c = im.channels;
  *bits = im.bit_depth;
  return 1;
}
}
