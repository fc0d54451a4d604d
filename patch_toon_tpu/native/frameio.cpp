// frameio: native PNG codec + threaded frame prefetcher for video streaming.
//
// This is the TPU build's native data-loader runtime — the role the
// reference fills with torch DataLoader worker processes (training,
// lightning_model.py:348-356) and synchronous PIL decode/encode in the
// inference loop (generator.py:584,652). Decoding and encoding run in a
// C++ thread pool with an in-order bounded ring, so frame IO fully overlaps
// device compute in the streaming inference engine.
//
// Scope: 8-bit non-interlaced PNG, color types 0 (gray), 2 (RGB), 4
// (gray+alpha), 6 (RGBA); zlib for inflate/deflate/crc32. Anything else is
// rejected with an error code and the Python wrapper falls back to PIL.
//
// C ABI only (consumed via ctypes).

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- PNG read

struct Image {
  uint32_t width = 0;
  uint32_t height = 0;
  uint32_t channels = 0;
  std::vector<uint8_t> pixels;  // row-major, tightly packed
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// returns 0 on success, negative error code otherwise
int decode_png(const uint8_t* data, size_t size, Image* out) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || memcmp(data, sig, 8) != 0) return -1;

  size_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;

  while (pos + 8 <= size) {
    uint32_t len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + len > size) return -2;

    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return -2;
      width = be32(body);
      height = be32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }

  if (width == 0 || height == 0 || bit_depth != 8 || interlace != 0)
    return -3;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;
    case 2: channels = 3; break;
    case 4: channels = 2; break;
    case 6: channels = 4; break;
    default: return -3;  // palette etc. -> PIL fallback
  }

  const size_t stride = size_t(width) * channels;
  const size_t raw_size = (stride + 1) * height;
  std::vector<uint8_t> raw(raw_size);

  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -4;
  zs.next_in = const_cast<uint8_t*>(idat.data());
  zs.avail_in = static_cast<uInt>(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = static_cast<uInt>(raw.size());
  int zret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zret != Z_STREAM_END && !(zret == Z_OK && zs.avail_out == 0)) return -4;

  out->width = width;
  out->height = height;
  out->channels = channels;
  out->pixels.assign(stride * height, 0);

  const int bpp = channels;  // bytes per pixel (8-bit)
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = out->pixels.data() + stride * y;
    const uint8_t* up = y ? out->pixels.data() + stride * (y - 1) : nullptr;
    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (up ? up[x] : 0);
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          dst[x] = src[x] + uint8_t((a + b) / 2);
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
          dst[x] = src[x] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return -5;
    }
  }
  return 0;
}

// --------------------------------------------------------------- PNG write

void put_be32(std::vector<uint8_t>* v, uint32_t x) {
  v->push_back(uint8_t(x >> 24));
  v->push_back(uint8_t(x >> 16));
  v->push_back(uint8_t(x >> 8));
  v->push_back(uint8_t(x));
}

void put_chunk(std::vector<uint8_t>* v, const char* type,
               const uint8_t* body, size_t len) {
  put_be32(v, uint32_t(len));
  size_t start = v->size();
  v->insert(v->end(), type, type + 4);
  v->insert(v->end(), body, body + len);
  uint32_t crc = crc32(0, v->data() + start, uInt(4 + len));
  put_be32(v, crc);
}

int encode_png(const uint8_t* pixels, uint32_t width, uint32_t height,
               uint32_t channels, int compress_level,
               std::vector<uint8_t>* out) {
  if (channels != 1 && channels != 3 && channels != 4) return -1;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out->assign(sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = uint8_t(width >> 24); ihdr[1] = uint8_t(width >> 16);
  ihdr[2] = uint8_t(width >> 8);  ihdr[3] = uint8_t(width);
  ihdr[4] = uint8_t(height >> 24); ihdr[5] = uint8_t(height >> 16);
  ihdr[6] = uint8_t(height >> 8);  ihdr[7] = uint8_t(height);
  ihdr[8] = 8;  // bit depth
  ihdr[9] = channels == 1 ? 0 : (channels == 3 ? 2 : 6);
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);

  const size_t stride = size_t(width) * channels;
  std::vector<uint8_t> raw((stride + 1) * height);
  for (uint32_t y = 0; y < height; ++y) {
    raw[(stride + 1) * y] = 0;  // filter None
    memcpy(raw.data() + (stride + 1) * y + 1, pixels + stride * y, stride);
  }

  uLongf bound = compressBound(uLong(raw.size()));
  std::vector<uint8_t> compressed(bound);
  if (compress2(compressed.data(), &bound, raw.data(), uLong(raw.size()),
                compress_level) != Z_OK)
    return -2;
  put_chunk(out, "IDAT", compressed.data(), bound);
  put_chunk(out, "IEND", nullptr, 0);
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size_t(n));
  size_t got = fread(out->data(), 1, size_t(n), f);
  fclose(f);
  return got == size_t(n) ? 0 : -1;
}

// --------------------------------------------------- threaded frame loader

struct Slot {
  Image img;
  int status = 0;     // 0 = pending, 1 = ready, <0 = error
  bool done = false;
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<Slot> slots;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_window;
  std::atomic<size_t> next_job{0};
  size_t next_consume = 0;  // guarded by mu
  size_t window = 8;
  bool stopping = false;

  void work() {
    for (;;) {
      size_t i = next_job.fetch_add(1);
      if (i >= paths.size()) return;
      {
        // bound the decode window so memory stays O(window)
        std::unique_lock<std::mutex> lock(mu);
        cv_window.wait(lock, [&] {
          return stopping || i < next_consume + window;
        });
        if (stopping) return;
      }
      Image img;
      std::vector<uint8_t> file;
      int rc = read_file(paths[i].c_str(), &file);
      if (rc == 0) rc = decode_png(file.data(), file.size(), &img);
      {
        std::lock_guard<std::mutex> lock(mu);
        slots[i].img = std::move(img);
        slots[i].status = rc == 0 ? 1 : (rc < 0 ? rc : -99);
        slots[i].done = true;
      }
      cv_ready.notify_all();
    }
  }
};

// --------------------------------------------------- threaded frame writer

struct WriteJob {
  std::string path;
  std::vector<uint8_t> pixels;
  uint32_t width, height, channels;
};

struct Writer {
  std::vector<std::thread> workers;
  std::queue<WriteJob> jobs;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> pending{0};
  std::atomic<int> errors{0};
  bool stopping = false;
  int compress_level = 1;  // speed over size for streaming video

  void work() {
    for (;;) {
      WriteJob job;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [&] { return stopping || !jobs.empty(); });
        if (jobs.empty()) {
          if (stopping) return;
          continue;
        }
        job = std::move(jobs.front());
        jobs.pop();
      }
      std::vector<uint8_t> png;
      int rc = encode_png(job.pixels.data(), job.width, job.height,
                          job.channels, compress_level, &png);
      if (rc == 0) {
        FILE* f = fopen(job.path.c_str(), "wb");
        if (f) {
          fwrite(png.data(), 1, png.size(), f);
          fclose(f);
        } else {
          rc = -3;
        }
      }
      if (rc != 0) errors.fetch_add(1);
      pending.fetch_sub(1);
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// one-shot decode: caller provides path; returns malloc'd pixel buffer via
// out params. Returns 0 on success. Caller frees with frameio_free.
int frameio_decode(const char* path, uint8_t** pixels, uint32_t* width,
                   uint32_t* height, uint32_t* channels) {
  std::vector<uint8_t> file;
  if (read_file(path, &file) != 0) return -1;
  Image img;
  int rc = decode_png(file.data(), file.size(), &img);
  if (rc != 0) return rc;
  *pixels = static_cast<uint8_t*>(malloc(img.pixels.size()));
  memcpy(*pixels, img.pixels.data(), img.pixels.size());
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  return 0;
}

int frameio_encode(const char* path, const uint8_t* pixels, uint32_t width,
                   uint32_t height, uint32_t channels, int compress_level) {
  std::vector<uint8_t> png;
  int rc = encode_png(pixels, width, height, channels, compress_level, &png);
  if (rc != 0) return rc;
  FILE* f = fopen(path, "wb");
  if (!f) return -3;
  fwrite(png.data(), 1, png.size(), f);
  fclose(f);
  return 0;
}

void frameio_free(uint8_t* p) { free(p); }

// -- loader ----------------------------------------------------------------

void* frameio_loader_create(const char** paths, int n, int num_threads,
                            int window) {
  auto* loader = new Loader();
  loader->paths.assign(paths, paths + n);
  loader->slots.resize(n);
  loader->window = window > 0 ? size_t(window) : 8;
  int threads = num_threads > 0 ? num_threads : 4;
  for (int i = 0; i < threads; ++i)
    loader->workers.emplace_back([loader] { loader->work(); });
  return loader;
}

// blocks until frame `index` is decoded; returns 0 on success.
int frameio_loader_get(void* handle, int index, uint8_t** pixels,
                       uint32_t* width, uint32_t* height,
                       uint32_t* channels) {
  auto* loader = static_cast<Loader*>(handle);
  if (index < 0 || size_t(index) >= loader->slots.size()) return -1;
  std::unique_lock<std::mutex> lock(loader->mu);
  loader->cv_ready.wait(lock, [&] { return loader->slots[index].done; });
  Slot& slot = loader->slots[index];
  if (slot.status != 1) return slot.status;
  Image& img = slot.img;
  *pixels = static_cast<uint8_t*>(malloc(img.pixels.size()));
  memcpy(*pixels, img.pixels.data(), img.pixels.size());
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  // advance the consume pointer and wake decoders waiting on the window
  if (size_t(index) >= loader->next_consume)
    loader->next_consume = size_t(index) + 1;
  img.pixels.clear();
  img.pixels.shrink_to_fit();
  loader->cv_window.notify_all();
  return 0;
}

void frameio_loader_destroy(void* handle) {
  auto* loader = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lock(loader->mu);
    loader->stopping = true;
    loader->next_consume = loader->paths.size();  // release window waiters
  }
  loader->cv_window.notify_all();
  loader->next_job.store(loader->paths.size());
  for (auto& t : loader->workers) t.join();
  delete loader;
}

// -- writer ------------------------------------------------------------------

void* frameio_writer_create(int num_threads, int compress_level) {
  auto* writer = new Writer();
  writer->compress_level = compress_level;
  int threads = num_threads > 0 ? num_threads : 2;
  for (int i = 0; i < threads; ++i)
    writer->workers.emplace_back([writer] { writer->work(); });
  return writer;
}

void frameio_writer_submit(void* handle, const char* path,
                           const uint8_t* pixels, uint32_t width,
                           uint32_t height, uint32_t channels) {
  auto* writer = static_cast<Writer*>(handle);
  WriteJob job;
  job.path = path;
  job.pixels.assign(pixels, pixels + size_t(width) * height * channels);
  job.width = width;
  job.height = height;
  job.channels = channels;
  writer->pending.fetch_add(1);
  {
    std::lock_guard<std::mutex> lock(writer->mu);
    writer->jobs.push(std::move(job));
  }
  writer->cv.notify_all();
}

// waits for all submitted writes; returns number of failed writes.
int frameio_writer_flush(void* handle) {
  auto* writer = static_cast<Writer*>(handle);
  std::unique_lock<std::mutex> lock(writer->mu);
  writer->cv.wait(lock, [&] { return writer->pending.load() == 0; });
  return writer->errors.load();
}

void frameio_writer_destroy(void* handle) {
  auto* writer = static_cast<Writer*>(handle);
  {
    std::lock_guard<std::mutex> lock(writer->mu);
    writer->stopping = true;
  }
  writer->cv.notify_all();
  for (auto& t : writer->workers) t.join();
  delete writer;
}

}  // extern "C"
