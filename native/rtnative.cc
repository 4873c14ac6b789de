// Native host-runtime helpers for the TPU path tracer.
//
// The reference implements its whole runtime in C++: worker threads pulling
// tiles from a mutexed queue, per-pixel ZeroMQ channel messages back to a
// render thread, and a GL presentation path (/root/reference/src/main.cc:
// 404-782, ray.tracer.image.display.cc). In the TPU build the device side is
// XLA/Pallas; this library provides the native equivalents of the *host*
// runtime around it:
//
//   * rt_png_encode        -- PNG (8-bit RGB, zlib deflate) encoder; the
//                             capability the reference vendors via
//                             stb_image_write but never wires up
//                             (SURVEY.md section 2M).
//   * rt_compose_halfblock -- ANSI 24-bit half-block frame composer for the
//                             live terminal display: the per-frame
//                             pixel -> presentation hot loop (the analog of
//                             the SSBO blit, image.display.cc:108-117).
//   * rt_pump_*            -- an async frame pump: a worker thread consuming
//                             a bounded frame queue and encoding/writing
//                             preview PNGs, so presentation IO overlaps
//                             device compute. This is the worker/channel
//                             runtime analog (main.cc:404-519), with the
//                             roles inverted: compute stays on-device, IO is
//                             the part worth a thread.
//
// C ABI only (consumed from Python via ctypes; no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// PNG encoding
// ---------------------------------------------------------------------------

void put_u32_be(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(uint8_t(v >> 24));
  out.push_back(uint8_t(v >> 16));
  out.push_back(uint8_t(v >> 8));
  out.push_back(uint8_t(v));
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_u32_be(out, uint32_t(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out.data() + start, uInt(4 + len));
  put_u32_be(out, crc);
}

// 8-bit RGB PNG with per-row Paeth filtering (filter type 4 compresses
// gradients/noise well and is what stb uses by default for RGB).
bool png_encode(const uint8_t* rgb, int w, int h, std::vector<uint8_t>& out) {
  if (w <= 0 || h <= 0) return false;
  const size_t stride = size_t(w) * 3;
  std::vector<uint8_t> raw((stride + 1) * size_t(h));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + size_t(y) * (stride + 1);
    const uint8_t* src = rgb + size_t(y) * stride;
    const uint8_t* up = y ? src - stride : nullptr;
    row[0] = 4;  // Paeth
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= 3 ? src[x - 3] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= 3) ? up[x - 3] : 0;
      int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
      int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
      row[1 + x] = uint8_t(src[x] - pred);
    }
  }

  uLongf zcap = compressBound(uLong(raw.size()));
  std::vector<uint8_t> zbuf(zcap);
  if (compress2(zbuf.data(), &zcap, raw.data(), uLong(raw.size()), 6) != Z_OK)
    return false;

  out.clear();
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A,
                                   '\n'};
  out.insert(out.end(), magic, magic + 8);
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(w >> 24); ihdr[1] = uint8_t(w >> 16);
  ihdr[2] = uint8_t(w >> 8);  ihdr[3] = uint8_t(w);
  ihdr[4] = uint8_t(h >> 24); ihdr[5] = uint8_t(h >> 16);
  ihdr[6] = uint8_t(h >> 8);  ihdr[7] = uint8_t(h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", zbuf.data(), zcap);
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

// ---------------------------------------------------------------------------
// ANSI half-block composition
// ---------------------------------------------------------------------------

void append_u8(std::string& s, unsigned v) {
  if (v >= 100) {
    s += char('0' + v / 100);
    v %= 100;
    s += char('0' + v / 10);
    s += char('0' + v % 10);
  } else if (v >= 10) {
    s += char('0' + v / 10);
    s += char('0' + v % 10);
  } else {
    s += char('0' + v);
  }
}

// Two image rows per text row: fg = upper pixel, bg = lower pixel, glyph ▀.
void compose_halfblock(const uint8_t* rgb, int w, int h, std::string& out) {
  out.clear();
  out.reserve(size_t(h / 2 + 1) * size_t(w) * 40);
  int prev_fg = -1, prev_bg = -1;
  for (int y = 0; y + 1 < h; y += 2) {
    if (y) out += '\n';
    prev_fg = prev_bg = -1;  // colors reset at row end
    const uint8_t* top = rgb + size_t(y) * w * 3;
    const uint8_t* bot = top + size_t(w) * 3;
    for (int x = 0; x < w; ++x) {
      int fg = (top[3 * x] << 16) | (top[3 * x + 1] << 8) | top[3 * x + 2];
      int bg = (bot[3 * x] << 16) | (bot[3 * x + 1] << 8) | bot[3 * x + 2];
      if (fg != prev_fg) {
        out += "\x1b[38;2;";
        append_u8(out, unsigned(fg >> 16)); out += ';';
        append_u8(out, unsigned((fg >> 8) & 255)); out += ';';
        append_u8(out, unsigned(fg & 255)); out += 'm';
        prev_fg = fg;
      }
      if (bg != prev_bg) {
        out += "\x1b[48;2;";
        append_u8(out, unsigned(bg >> 16)); out += ';';
        append_u8(out, unsigned((bg >> 8) & 255)); out += ';';
        append_u8(out, unsigned(bg & 255)); out += 'm';
        prev_bg = bg;
      }
      out += "\xE2\x96\x80";  // U+2580 upper half block
    }
    out += "\x1b[0m";
  }
}

// ---------------------------------------------------------------------------
// Async frame pump
// ---------------------------------------------------------------------------

struct Frame {
  std::vector<uint8_t> rgb;
  int w, h, index;
};

struct Pump {
  std::string prefix;
  size_t depth;
  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::thread worker;
  std::atomic<bool> stop{false};

  void run() {
    for (;;) {
      Frame f;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) return;
          continue;
        }
        f = std::move(queue.front());
        queue.pop_front();
      }
      std::vector<uint8_t> png;
      if (png_encode(f.rgb.data(), f.w, f.h, png)) {
        char path[4096];
        snprintf(path, sizeof(path), "%s%04d.png", prefix.c_str(), f.index);
        if (FILE* fp = fopen(path, "wb")) {
          fwrite(png.data(), 1, png.size(), fp);
          fclose(fp);
        }
      }
    }
  }
};

}  // namespace

extern "C" {

// rgb: uint8[h][w][3]. Writes the ANSI frame into buf (UTF-8, no trailing
// NUL needed); returns byte length, or -1 if cap is too small.
long long rt_compose_halfblock(const void* rgb, int w, int h, void* buf,
                               long long cap) {
  std::string s;
  compose_halfblock(static_cast<const uint8_t*>(rgb), w, h, s);
  if ((long long)s.size() > cap) return -1;
  memcpy(buf, s.data(), s.size());
  return (long long)s.size();
}

// Returns PNG byte length written into buf, or -1 on failure/too small.
long long rt_png_encode(const void* rgb, int w, int h, void* buf,
                        long long cap) {
  std::vector<uint8_t> png;
  if (!png_encode(static_cast<const uint8_t*>(rgb), w, h, png)) return -1;
  if ((long long)png.size() > cap) return -1;
  memcpy(buf, png.data(), png.size());
  return (long long)png.size();
}

void* rt_pump_create(const char* prefix, int queue_depth) {
  Pump* p = new Pump;
  p->prefix = prefix ? prefix : "frame_";
  p->depth = queue_depth > 0 ? size_t(queue_depth) : 4;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Returns 0 if enqueued, 1 if dropped (queue full), -1 on bad handle.
int rt_pump_submit(void* handle, const void* rgb, int w, int h, int index) {
  Pump* p = static_cast<Pump*>(handle);
  if (!p || w <= 0 || h <= 0) return -1;
  const uint8_t* src = static_cast<const uint8_t*>(rgb);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->queue.size() >= p->depth) return 1;  // drop, never block render
    Frame f;
    f.rgb.assign(src, src + size_t(w) * size_t(h) * 3);
    f.w = w;
    f.h = h;
    f.index = index;
    p->queue.push_back(std::move(f));
  }
  p->cv.notify_one();
  return 0;
}

// Drains the queue, joins the worker, frees the pump.
int rt_pump_destroy(void* handle) {
  Pump* p = static_cast<Pump*>(handle);
  if (!p) return -1;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop.store(true);
  }
  p->cv.notify_all();
  p->worker.join();
  delete p;
  return 0;
}

}  // extern "C"
