// Native stereo sample loader: threaded image decode + crop/pad into
// caller-provided float buffers, delivered in submission order.
//
// This is the framework's native runtime component (the reference's
// native code is its CUDA correlation op, Nets/Native/ — our compute
// kernels are Pallas/XLA; the host-side decode pipeline lives here so
// the Python frame loop never blocks on image IO). Formats: PNG
// (8/16-bit, gray/RGB/RGBA via libpng), JPEG (via libjpeg), PFM
// (little/big endian), PGM/PPM binary. 16-bit PNG disparities are
// divided by 256 (KITTI encoding), matching the Python reader
// (data/readers.py) and the reference's auto-detection
// (Data_utils/data_reader.py:138-143).
//
// Build: g++ -O3 -fPIC -shared -std=c++17 stereo_loader.cc -o
//        libstereo_loader.so -lpng -ljpeg -lz -lpthread

#include <png.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<float> data;  // HWC
  bool ok = false;
};

// ------------------------------------------------------------------ decode

Image decode_png(FILE* f) {
  Image img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  int channels = png_get_channels(png, info);
  const bool sixteen = bit_depth == 16;
  std::vector<png_byte> row(png_get_rowbytes(png, info));

  img.h = (int)h;
  img.w = (int)w;
  img.c = channels;
  img.data.resize((size_t)h * w * channels);
  // 16-bit disparity PNGs decode to value/256 (KITTI), 8-bit stays raw.
  const float scale16 = 1.0f / 256.0f;
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = img.data.data() + (size_t)y * w * channels;
    if (sixteen) {
      for (size_t i = 0; i < (size_t)w * channels; ++i) {
        uint16_t v = (uint16_t)((row[2 * i] << 8) | row[2 * i + 1]);  // PNG is big-endian
        dst[i] = (float)v * scale16;
      }
    } else {
      for (size_t i = 0; i < (size_t)w * channels; ++i) dst[i] = (float)row[i];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_start_decompress(&cinfo);
  img.h = cinfo.output_height;
  img.w = cinfo.output_width;
  img.c = cinfo.output_components;
  img.data.resize((size_t)img.h * img.w * img.c);
  std::vector<unsigned char> row((size_t)img.w * img.c);
  unsigned char* rp = row.data();
  for (int y = 0; y < img.h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = img.data.data() + (size_t)y * img.w * img.c;
    for (size_t i = 0; i < row.size(); ++i) dst[i] = (float)row[i];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_pfm(FILE* f) {
  Image img;
  char header[3] = {0};
  if (fscanf(f, "%2s", header) != 1) return img;
  int channels = 0;
  if (strcmp(header, "PF") == 0) channels = 3;
  else if (strcmp(header, "Pf") == 0) channels = 1;
  else return img;
  int w, h;
  double scale;
  if (fscanf(f, "%d %d %lf", &w, &h, &scale) != 3) return img;
  fgetc(f);  // single whitespace after header
  const bool little = scale < 0;
  img.h = h;
  img.w = w;
  img.c = channels;
  img.data.resize((size_t)h * w * channels);
  std::vector<float> rowbuf((size_t)w * channels);
  // PFM rows are bottom-to-top
  for (int y = h - 1; y >= 0; --y) {
    if (fread(rowbuf.data(), sizeof(float), rowbuf.size(), f) != rowbuf.size()) return img;
    if (!little) {
      for (auto& v : rowbuf) {
        uint32_t u;
        memcpy(&u, &v, 4);
        u = __builtin_bswap32(u);
        memcpy(&v, &u, 4);
      }
    }
    memcpy(img.data.data() + (size_t)y * w * channels, rowbuf.data(),
           rowbuf.size() * sizeof(float));
  }
  img.ok = true;
  return img;
}

Image decode_pnm(FILE* f) {  // binary PGM (P5) / PPM (P6)
  Image img;
  char header[3] = {0};
  if (fscanf(f, "%2s", header) != 1) return img;
  int channels = 0;
  if (strcmp(header, "P5") == 0) channels = 1;
  else if (strcmp(header, "P6") == 0) channels = 3;
  else return img;
  int w, h, maxv;
  if (fscanf(f, "%d %d %d", &w, &h, &maxv) != 3) return img;
  fgetc(f);
  img.h = h;
  img.w = w;
  img.c = channels;
  img.data.resize((size_t)h * w * channels);
  if (maxv < 256) {
    std::vector<unsigned char> buf((size_t)h * w * channels);
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) return img;
    for (size_t i = 0; i < buf.size(); ++i) img.data[i] = (float)buf[i];
  } else {
    std::vector<uint16_t> buf((size_t)h * w * channels);
    if (fread(buf.data(), 2, buf.size(), f) != buf.size()) return img;
    for (size_t i = 0; i < buf.size(); ++i)
      img.data[i] = (float)(uint16_t)((buf[i] >> 8) | (buf[i] << 8)) / 256.0f;
  }
  img.ok = true;
  return img;
}

Image load_image_file(const std::string& path) {
  Image img;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return img;
  unsigned char sig[8] = {0};
  size_t n = fread(sig, 1, 8, f);
  if (n >= 8 && png_sig_cmp(sig, 0, 8) == 0) {
    img = decode_png(f);  // stream already positioned after signature
  } else {
    rewind(f);
    if (n >= 2 && sig[0] == 0xFF && sig[1] == 0xD8) img = decode_jpeg(f);
    else if (n >= 2 && sig[0] == 'P' && (sig[1] == 'F' || sig[1] == 'f')) img = decode_pfm(f);
    else if (n >= 2 && sig[0] == 'P' && (sig[1] == '5' || sig[1] == '6')) img = decode_pnm(f);
  }
  fclose(f);
  return img;
}

// ------------------------------------------------------------- crop / pad

// centered crop-or-zero-pad to (th, tw) with `tc` output channels
// (replicates gray->RGB, drops alpha)
void crop_or_pad(const Image& src, float* dst, int th, int tw, int tc) {
  memset(dst, 0, (size_t)th * tw * tc * sizeof(float));
  int sy = src.h > th ? (src.h - th) / 2 : 0;
  int sx = src.w > tw ? (src.w - tw) / 2 : 0;
  int dy = src.h < th ? (th - src.h) / 2 : 0;
  int dx = src.w < tw ? (tw - src.w) / 2 : 0;
  int ch = std::min(src.h - sy, th - dy);
  int cw = std::min(src.w - sx, tw - dx);
  for (int y = 0; y < ch; ++y) {
    const float* srow = src.data.data() + ((size_t)(sy + y) * src.w + sx) * src.c;
    float* drow = dst + ((size_t)(dy + y) * tw + dx) * tc;
    for (int x = 0; x < cw; ++x) {
      for (int c = 0; c < tc; ++c) {
        int sc = src.c == 1 ? 0 : std::min(c, src.c - 1);
        drow[(size_t)x * tc + c] = srow[(size_t)x * src.c + sc];
      }
    }
  }
}

// aligned random crop at (r0, c0)
void crop_at(const Image& src, float* dst, int th, int tw, int tc, int r0, int c0) {
  for (int y = 0; y < th; ++y) {
    int sy = std::min(r0 + y, src.h - 1);
    const float* srow = src.data.data() + ((size_t)sy * src.w) * src.c;
    float* drow = dst + ((size_t)y * tw) * tc;
    for (int x = 0; x < tw; ++x) {
      int sx = std::min(c0 + x, src.w - 1);
      for (int c = 0; c < tc; ++c) {
        int sc = src.c == 1 ? 0 : std::min(c, src.c - 1);
        drow[(size_t)x * tc + c] = srow[(size_t)sx * src.c + sc];
      }
    }
  }
}

// ------------------------------------------------------------------ loader

struct Job {
  long id;
  std::string left, right, gt, proxy;
  int crop_h, crop_w;
  bool train;
  uint64_t seed;
};

struct Result {
  long id;
  int real_width = -1;  // -1 => decode error
  std::vector<float> left, right, gt, proxy;
  bool has_proxy = false;
};

struct Loader {
  std::vector<std::thread> workers;
  std::deque<Job> jobs;
  std::map<long, Result> done;
  long next_submit = 0;
  long next_deliver = 0;
  size_t capacity;
  bool shutdown = false;
  std::mutex mu;
  std::condition_variable cv_job, cv_done, cv_space;

  explicit Loader(int n_workers, size_t cap) : capacity(cap) {
    for (int i = 0; i < n_workers; ++i)
      workers.emplace_back([this] { this->work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      shutdown = true;
    }
    cv_job.notify_all();
    cv_done.notify_all();
    cv_space.notify_all();
    for (auto& t : workers) t.join();
  }

  void work() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return shutdown || !jobs.empty(); });
        if (shutdown) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      Result res;
      res.id = job.id;
      process(job, res);
      {
        std::lock_guard<std::mutex> lk(mu);
        done[res.id] = std::move(res);
      }
      cv_done.notify_all();
    }
  }

  static void process(const Job& job, Result& res) {
    Image left = load_image_file(job.left);
    Image right = load_image_file(job.right);
    if (!left.ok || !right.ok) return;
    Image gt;
    if (!job.gt.empty()) {
      gt = load_image_file(job.gt);
      if (!gt.ok) return;
      gt.w = std::min(gt.w, left.w);  // width-align (data_reader.py:145)
    } else {
      gt.h = left.h; gt.w = left.w; gt.c = 1;
      gt.data.assign((size_t)gt.h * gt.w, 0.0f);
      gt.ok = true;
    }
    Image proxy;
    if (!job.proxy.empty()) {
      proxy = load_image_file(job.proxy);
      if (!proxy.ok) return;
      res.has_proxy = true;
    }

    const int th = job.crop_h, tw = job.crop_w;
    res.left.resize((size_t)th * tw * 3);
    res.right.resize((size_t)th * tw * 3);
    res.gt.resize((size_t)th * tw);
    if (res.has_proxy) res.proxy.resize((size_t)th * tw);

    if (job.train) {
      std::mt19937_64 rng(job.seed);
      int max_r = std::max(left.h - th - 1, 1);
      int max_c = std::max(left.w - tw - 1, 1);
      int r0 = (int)(rng() % (uint64_t)max_r);
      int c0 = (int)(rng() % (uint64_t)max_c);
      crop_at(left, res.left.data(), th, tw, 3, r0, c0);
      crop_at(right, res.right.data(), th, tw, 3, r0, c0);
      crop_at(gt, res.gt.data(), th, tw, 1, r0, c0);
      if (res.has_proxy) crop_at(proxy, res.proxy.data(), th, tw, 1, r0, c0);
    } else {
      crop_or_pad(left, res.left.data(), th, tw, 3);
      crop_or_pad(right, res.right.data(), th, tw, 3);
      crop_or_pad(gt, res.gt.data(), th, tw, 1);
      if (res.has_proxy) crop_or_pad(proxy, res.proxy.data(), th, tw, 1);
    }
    res.real_width = left.w;
  }
};

}  // namespace

extern "C" {

void* sl_create(int workers, int capacity) {
  return new Loader(std::max(1, workers), (size_t)std::max(1, capacity));
}

void sl_destroy(void* p) { delete (Loader*)p; }

// Enqueue a sample; blocks if the pipeline is full. Returns the job id.
long sl_submit(void* p, const char* left, const char* right, const char* gt,
               const char* proxy, int crop_h, int crop_w, int train,
               uint64_t seed) {
  Loader* L = (Loader*)p;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_space.wait(lk, [&] {
    return L->shutdown ||
           (L->next_submit - L->next_deliver) < (long)L->capacity;
  });
  if (L->shutdown) return -1;
  Job job{L->next_submit++, left, right, gt ? gt : "", proxy ? proxy : "",
          crop_h, crop_w, train != 0, seed};
  L->jobs.push_back(std::move(job));
  lk.unlock();
  L->cv_job.notify_one();
  return job.id;
}

// Blocks until the next sample (submission order) is decoded; copies it
// into the caller's buffers. Returns real_width, or -1 on decode error,
// -2 on shutdown. has_proxy_out is set to 0/1.
int sl_next(void* p, float* left, float* right, float* gt, float* proxy,
            int* has_proxy_out) {
  Loader* L = (Loader*)p;
  Result res;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    long want = L->next_deliver;
    L->cv_done.wait(lk, [&] { return L->shutdown || L->done.count(want); });
    if (L->shutdown && !L->done.count(want)) return -2;
    res = std::move(L->done[want]);
    L->done.erase(want);
    L->next_deliver++;
  }
  L->cv_space.notify_all();
  if (res.real_width < 0) return -1;
  memcpy(left, res.left.data(), res.left.size() * sizeof(float));
  memcpy(right, res.right.data(), res.right.size() * sizeof(float));
  memcpy(gt, res.gt.data(), res.gt.size() * sizeof(float));
  if (has_proxy_out) *has_proxy_out = res.has_proxy ? 1 : 0;
  if (res.has_proxy && proxy)
    memcpy(proxy, res.proxy.data(), res.proxy.size() * sizeof(float));
  return res.real_width;
}

}  // extern "C"
