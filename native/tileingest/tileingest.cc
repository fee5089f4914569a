// tileingest implementation. See tileingest.h for the contract and
// SURVEY.md §2.11 for the parity mapping (OpenSlide read_region hot path →
// native threaded batch extraction).

#include "tileingest.h"

#include <tiffio.h>

#include "jp2k.h"
#include "mirax.h"
#include "slide.h"

#include <algorithm>
#include <atomic>
#include <cctype>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

using tileingest::Level;
using tileingest::Slide;

// TIFF-container backend (tiled/striped TIFF, Aperio SVS incl. JP2K,
// Hamamatsu NDPI). MIRAX lives in mirax.cc behind the same Slide interface.
struct TiffSlide : Slide {
  // libtiff handles are NOT thread-safe; one handle per (slide, thread).
  std::mutex handles_mu;
  std::vector<TIFF*> handles;

  ~TiffSlide() override {
    for (TIFF* t : handles)
      if (t) TIFFClose(t);
  }

  TIFF* acquire() {
    std::lock_guard<std::mutex> lk(handles_mu);
    if (!handles.empty()) {
      TIFF* t = handles.back();
      handles.pop_back();
      return t;
    }
    return TIFFOpen(path.c_str(), "r");
  }

  void release(TIFF* t) {
    std::lock_guard<std::mutex> lk(handles_mu);
    handles.push_back(t);
  }

  int read_rect(int level, int64_t x0, int64_t y0, int64_t w, int64_t h,
                uint8_t* out) override;
};

std::mutex g_slides_mu;
// shared_ptr, not unique_ptr: a worker mid-read holds its own reference, so
// ti_close during an in-flight batch (prefetcher shutdown races the last
// extract) releases the Slide only after the job finishes — never a
// use-after-free on handles/levels.
std::vector<std::shared_ptr<Slide>> g_slides;

std::shared_ptr<Slide> get_slide(int id) {
  std::lock_guard<std::mutex> lk(g_slides_mu);
  if (id < 0 || id >= static_cast<int>(g_slides.size())) return nullptr;
  return g_slides[id];
}

// Reads the full rect (x0,y0,w,h) in LEVEL coordinates into out RGB8.
// Out-of-bounds zero-filled. Returns 0 on success.
int read_level_rect(TiffSlide* s, TIFF* tif, int level, int64_t x0,
                    int64_t y0, int64_t w, int64_t h, uint8_t* out) {
  const Level& lv = s->levels[level];
  if (!TIFFSetDirectory(tif, static_cast<tdir_t>(lv.dir))) return -2;
  std::memset(out, 0, static_cast<size_t>(w) * h * 3);

  const int64_t rx0 = std::max<int64_t>(x0, 0);
  const int64_t ry0 = std::max<int64_t>(y0, 0);
  const int64_t rx1 = std::min<int64_t>(x0 + w, lv.width);
  const int64_t ry1 = std::min<int64_t>(y0 + h, lv.height);
  if (rx0 >= rx1 || ry0 >= ry1) return 0;  // fully outside → zeros

  if (TIFFIsTiled(tif)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return -3;

    // Aperio JP2K SVS (33003 YCbCr / 33005 RGB) and standard JP2000 (34712):
    // libtiff has no codec for these — read raw codestreams and decode via
    // the dlopen'd libopenjp2 (jp2k.cc). Reference parity: OpenSlide's
    // aperio driver (utils.py:176 read_region on JP2K cohorts).
    uint16_t comp = 0, photometric = 0;
    TIFFGetField(tif, TIFFTAG_COMPRESSION, &comp);
    TIFFGetFieldDefaulted(tif, TIFFTAG_PHOTOMETRIC, &photometric);
    const bool is_jp2k = (comp == 33003 || comp == 33005 || comp == 34712);
    if (is_jp2k) {
      if (!jp2k_available()) return -6;
      const bool ycbcr = comp == 33003 || photometric == PHOTOMETRIC_YCBCR;
      std::vector<uint8_t> raw;
      std::vector<uint8_t> rgb(static_cast<size_t>(tw) * th * 3);
      uint64_t* bytecounts = nullptr;
      if (!TIFFGetField(tif, TIFFTAG_TILEBYTECOUNTS, &bytecounts) ||
          !bytecounts)
        return -6;
      for (int64_t ty = (ry0 / th) * th; ty < ry1; ty += th) {
        for (int64_t tx = (rx0 / tw) * tw; tx < rx1; tx += tw) {
          const uint32_t tile = TIFFComputeTile(
              tif, static_cast<uint32_t>(tx), static_cast<uint32_t>(ty), 0, 0);
          const tmsize_t nbytes = static_cast<tmsize_t>(bytecounts[tile]);
          if (nbytes <= 0) return -6;
          raw.resize(static_cast<size_t>(nbytes));
          if (TIFFReadRawTile(tif, tile, raw.data(), nbytes) != nbytes)
            return -6;
          if (jp2k_decode(raw.data(), raw.size(), rgb.data(),
                          static_cast<int64_t>(tw), static_cast<int64_t>(th),
                          ycbcr) != 0)
            return -6;
          const int64_t cx0 = std::max<int64_t>(tx, rx0);
          const int64_t cy0 = std::max<int64_t>(ty, ry0);
          const int64_t cx1 = std::min<int64_t>(tx + tw, rx1);
          const int64_t cy1 = std::min<int64_t>(ty + th, ry1);
          for (int64_t yy = cy0; yy < cy1; ++yy) {
            // jp2k_decode writes top-down rows (no RGBA flip needed).
            const uint8_t* src =
                rgb.data() + ((yy - ty) * tw + (cx0 - tx)) * 3;
            uint8_t* dst = out + ((yy - y0) * w + (cx0 - x0)) * 3;
            std::memcpy(dst, src, static_cast<size_t>(cx1 - cx0) * 3);
          }
        }
      }
      return 0;
    }

    std::vector<uint32_t> tilebuf(static_cast<size_t>(tw) * th);
    for (int64_t ty = (ry0 / th) * th; ty < ry1; ty += th) {
      for (int64_t tx = (rx0 / tw) * tw; tx < rx1; tx += tw) {
        // RGBA-decoded tile (handles JPEG-compressed SVS tiles via libjpeg).
        if (!TIFFReadRGBATile(tif, static_cast<uint32_t>(tx),
                              static_cast<uint32_t>(ty), tilebuf.data()))
          return -4;
        const int64_t cx0 = std::max<int64_t>(tx, rx0);
        const int64_t cy0 = std::max<int64_t>(ty, ry0);
        const int64_t cx1 = std::min<int64_t>(tx + tw, rx1);
        const int64_t cy1 = std::min<int64_t>(ty + th, ry1);
        for (int64_t yy = cy0; yy < cy1; ++yy) {
          // TIFFReadRGBATile returns bottom-up rows.
          const uint32_t* src =
              tilebuf.data() + (th - 1 - (yy - ty)) * tw + (cx0 - tx);
          uint8_t* dst = out + ((yy - y0) * w + (cx0 - x0)) * 3;
          for (int64_t xx = cx0; xx < cx1; ++xx, ++src, dst += 3) {
            const uint32_t p = *src;
            dst[0] = TIFFGetR(p);
            dst[1] = TIFFGetG(p);
            dst[2] = TIFFGetB(p);
          }
        }
      }
    }
    return 0;
  }

  // Strip/scanline image: decode the needed rows via RGBA strip reader.
  uint32_t rows_per_strip = 0;
  TIFFGetFieldDefaulted(tif, TIFFTAG_ROWSPERSTRIP, &rows_per_strip);
  // libtiff's defaulted ROWSPERSTRIP for a single-strip image (tag absent)
  // is (uint32)-1 — unclamped, width * 2^32 rows would be a multi-exabyte
  // vector whose bad_alloc unwinds through the extern "C" boundary and
  // aborts the process. Clamp to the level height (the partial-strip math
  // below already handles short final strips).
  if (rows_per_strip == 0 ||
      rows_per_strip > static_cast<uint32_t>(lv.height))
    rows_per_strip = static_cast<uint32_t>(lv.height);
  std::vector<uint32_t> strip(static_cast<size_t>(lv.width) * rows_per_strip);
  for (int64_t sy = (ry0 / rows_per_strip) * rows_per_strip; sy < ry1;
       sy += rows_per_strip) {
    if (!TIFFReadRGBAStrip(tif, static_cast<uint32_t>(sy), strip.data()))
      return -5;
    const int64_t rows = std::min<int64_t>(rows_per_strip, lv.height - sy);
    const int64_t cy0 = std::max<int64_t>(sy, ry0);
    const int64_t cy1 = std::min<int64_t>(sy + rows, ry1);
    for (int64_t yy = cy0; yy < cy1; ++yy) {
      const uint32_t* src =
          strip.data() + (rows - 1 - (yy - sy)) * lv.width + rx0;
      uint8_t* dst = out + ((yy - y0) * w + (rx0 - x0)) * 3;
      for (int64_t xx = rx0; xx < rx1; ++xx, ++src, dst += 3) {
        const uint32_t p = *src;
        dst[0] = TIFFGetR(p);
        dst[1] = TIFFGetG(p);
        dst[2] = TIFFGetB(p);
      }
    }
  }
  return 0;
}

int TiffSlide::read_rect(int level, int64_t x0, int64_t y0, int64_t w,
                         int64_t h, uint8_t* out) {
  TIFF* tif = acquire();
  if (!tif) return -2;
  const int rc = read_level_rect(this, tif, level, x0, y0, w, h, out);
  release(tif);
  return rc;
}

// Bilinear resize RGB8 (in: sw×sh) → (out: dw×dh).
// Fast paths: identity memcpy; exact 2:1 box filter (the dominant WSI case:
// read at 2× then halve). General path uses 8.8 fixed-point weights with
// per-column mappings precomputed once.
void resize_bilinear(const uint8_t* in, int64_t sw, int64_t sh, uint8_t* out,
                     int64_t dw, int64_t dh) {
  if (sw == dw && sh == dh) {
    std::memcpy(out, in, static_cast<size_t>(dw) * dh * 3);
    return;
  }
  if (sw == 2 * dw && sh == 2 * dh) {
    for (int64_t y = 0; y < dh; ++y) {
      const uint8_t* r0 = in + (2 * y) * sw * 3;
      const uint8_t* r1 = r0 + sw * 3;
      uint8_t* o = out + y * dw * 3;
      for (int64_t x = 0; x < dw; ++x) {
        const int64_t i = 2 * x * 3;
        for (int c = 0; c < 3; ++c) {
          o[x * 3 + c] = static_cast<uint8_t>(
              (static_cast<unsigned>(r0[i + c]) + r0[i + 3 + c] +
               r1[i + c] + r1[i + 3 + c] + 2) >> 2);
        }
      }
    }
    return;
  }
  std::vector<int32_t> xi0(dw), xi1(dw);
  std::vector<int32_t> xw(dw);  // 0..256 fixed-point
  for (int64_t x = 0; x < dw; ++x) {
    const float fx = (x + 0.5f) * sw / dw - 0.5f;
    int64_t x0 = static_cast<int64_t>(fx);
    x0 = std::clamp<int64_t>(x0, 0, sw - 1);
    xi0[x] = static_cast<int32_t>(x0 * 3);
    xi1[x] = static_cast<int32_t>(std::min<int64_t>(x0 + 1, sw - 1) * 3);
    xw[x] = static_cast<int32_t>(
        std::clamp(fx - x0, 0.0f, 1.0f) * 256.0f + 0.5f);
  }
  for (int64_t y = 0; y < dh; ++y) {
    const float fy = (y + 0.5f) * sh / dh - 0.5f;
    int64_t y0 = static_cast<int64_t>(fy);
    y0 = std::clamp<int64_t>(y0, 0, sh - 1);
    const int64_t y1 = std::min<int64_t>(y0 + 1, sh - 1);
    const int32_t wy = static_cast<int32_t>(
        std::clamp(fy - y0, 0.0f, 1.0f) * 256.0f + 0.5f);
    const uint8_t* r0 = in + y0 * sw * 3;
    const uint8_t* r1 = in + y1 * sw * 3;
    uint8_t* o = out + y * dw * 3;
    for (int64_t x = 0; x < dw; ++x) {
      const int32_t wx = xw[x];
      const int32_t i0 = xi0[x], i1 = xi1[x];
      for (int c = 0; c < 3; ++c) {
        const int32_t top = r0[i0 + c] * (256 - wx) + r0[i1 + c] * wx;
        const int32_t bot = r1[i0 + c] * (256 - wx) + r1[i1 + c] * wx;
        o[x * 3 + c] = static_cast<uint8_t>(
            (top * (256 - wy) + bot * wy + (1 << 15)) >> 16);
      }
    }
  }
}

// ---- worker pool --------------------------------------------------------------

struct Job {
  TiRequest req;
  uint8_t* out = nullptr;
  std::atomic<int>* failures = nullptr;
  std::atomic<int>* remaining = nullptr;
  std::condition_variable* done_cv = nullptr;
  std::mutex* done_mu = nullptr;
};

class Pool {
 public:
  ~Pool() { stop(); }  // joinable threads at process exit → std::terminate

  void start(int n) {
    std::lock_guard<std::mutex> lk(mu_);
    if (running_) return;
    running_ = true;
    if (n <= 0) n = static_cast<int>(std::thread::hardware_concurrency());
    n = std::max(n, 1);
    for (int i = 0; i < n; ++i)
      threads_.emplace_back([this] { worker(); });
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (!running_) return;
      running_ = false;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
    threads_.clear();
  }

  bool running() {
    std::lock_guard<std::mutex> lk(mu_);
    return running_;
  }

  void submit(Job job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return !running_ || !q_.empty(); });
        if (!running_ && q_.empty()) return;
        job = std::move(q_.front());
        q_.pop();
      }
      run_job(job);
      {
        // The decrement MUST happen under done_mu: if it preceded the lock,
        // a spurious wakeup in ti_extract_batch could observe remaining==0
        // and destroy the stack-allocated mutex/cv/atomics while this
        // thread is still about to lock them (use-after-scope → the
        // "corrupted double-linked list" abort seen under load).
        std::lock_guard<std::mutex> lk(*job.done_mu);
        if (job.remaining->fetch_sub(1) == 1) job.done_cv->notify_all();
      }
    }
  }

  static void run_job(const Job& job) {
    const TiRequest& r = job.req;
    uint8_t* out = job.out + r.index * static_cast<int64_t>(r.out_size) *
                                r.out_size * 3;
    std::shared_ptr<Slide> s = get_slide(r.slide);
    if (!s || r.level < 0 ||
        r.level >= static_cast<int>(s->levels.size())) {
      std::memset(out, 0, static_cast<size_t>(r.out_size) * r.out_size * 3);
      job.failures->fetch_add(1);
      return;
    }
    const double ds = s->levels[r.level].downsample;
    const int64_t lx = static_cast<int64_t>(r.x / ds);
    const int64_t ly = static_cast<int64_t>(r.y / ds);
    std::vector<uint8_t> buf(static_cast<size_t>(r.adjusted_size) *
                             r.adjusted_size * 3);
    int rc = s->read_rect(r.level, lx, ly, r.adjusted_size, r.adjusted_size,
                          buf.data());
    if (rc != 0) {
      // blank-patch fallback (utils.py:175-181) — zero-filled but COUNTED.
      std::memset(out, 0, static_cast<size_t>(r.out_size) * r.out_size * 3);
      job.failures->fetch_add(1);
      return;
    }
    resize_bilinear(buf.data(), r.adjusted_size, r.adjusted_size, out,
                    r.out_size, r.out_size);
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<Job> q_;
  std::vector<std::thread> threads_;
  bool running_ = false;
};

Pool g_pool;

}  // namespace

// ---- C API ---------------------------------------------------------------------

extern "C" {

int ti_abi_version() { return 1; }

int ti_open(const char* path) {
  {
    // MIRAX (.mrxs): directory-based format, no TIFF container — route to
    // the mirax.cc backend (reference: openslide's mirax vendor driver
    // behind utils.py:176 read_region; CARMEL cohorts,
    // datasets.py:1083-1086).
    const std::string p(path);
    const size_t dot = p.find_last_of('.');
    std::string ext = dot == std::string::npos ? "" : p.substr(dot);
    for (char& c : ext) c = static_cast<char>(std::tolower(c));
    if (ext == ".mrxs") {
      std::shared_ptr<Slide> slide(tileingest::mirax_open(path));
      if (!slide) return -1;
      std::lock_guard<std::mutex> lk(g_slides_mu);
      g_slides.push_back(std::move(slide));
      return static_cast<int>(g_slides.size()) - 1;
    }
  }
  TIFFSetErrorHandler(nullptr);  // quiet: errors become return codes
  TIFFSetWarningHandler(nullptr);
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return -1;
  auto slide = std::make_shared<TiffSlide>();
  slide->path = path;
  // Enumerate directories as pyramid levels. Real Aperio SVS layout is:
  // dir 0 base (tiled), dir 1 strip thumbnail, then the tiled reduced
  // levels, then strip label/macro pages — so "monotonically shrinking
  // width" mis-selects the thumbnail and drops every genuine level. Accept
  // a non-base directory only when it is marked FILETYPE_REDUCEDIMAGE or is
  // tiled (Aperio levels carry no SUBFILETYPE), is strictly smaller than
  // the base, is not a mask page, and matches the base aspect ratio (label/
  // macro pages do not). Sort by width afterwards so on-file directory
  // order never matters.
  int64_t base_w = 0, base_h = 0;
  do {
    uint32_t w = 0, h = 0;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
    if (w == 0 || h == 0) continue;
    if (slide->levels.empty()) {
      base_w = w;
      base_h = h;
    } else {
      uint32_t subfile = 0;
      TIFFGetFieldDefaulted(tif, TIFFTAG_SUBFILETYPE, &subfile);
      if ((subfile & FILETYPE_MASK) != 0) continue;
      const bool reduced = (subfile & FILETYPE_REDUCEDIMAGE) != 0;
      const bool tiled = TIFFIsTiled(tif) != 0;
      if (!reduced && !tiled) continue;  // strip thumbnail/label/macro
      if (static_cast<int64_t>(w) >= base_w) continue;
      const double base_ar = static_cast<double>(base_w) / base_h;
      const double ar = static_cast<double>(w) / h;
      if (ar > base_ar * 1.05 || ar < base_ar * 0.95) continue;
    }
    Level lv;
    lv.dir = TIFFCurrentDirectory(tif);
    lv.width = w;
    lv.height = h;
    lv.downsample = static_cast<double>(base_w) / w;
    slide->levels.push_back(lv);
  } while (TIFFReadDirectory(tif));
  if (slide->levels.empty()) {
    TIFFClose(tif);
    return -2;
  }
  std::sort(slide->levels.begin() + 1, slide->levels.end(),
            [](const Level& a, const Level& b) { return a.width > b.width; });
  slide->handles.push_back(tif);
  std::lock_guard<std::mutex> lk(g_slides_mu);
  g_slides.push_back(std::move(slide));
  return static_cast<int>(g_slides.size()) - 1;
}

void ti_close(int slide) {
  std::lock_guard<std::mutex> lk(g_slides_mu);
  if (slide >= 0 && slide < static_cast<int>(g_slides.size()))
    g_slides[slide].reset();
}

int ti_levels(int slide) {
  std::shared_ptr<Slide> s = get_slide(slide);
  return s ? static_cast<int>(s->levels.size()) : -1;
}

int ti_level_dims(int slide, int level, int64_t* width, int64_t* height) {
  std::shared_ptr<Slide> s = get_slide(slide);
  if (!s || level < 0 || level >= static_cast<int>(s->levels.size()))
    return -1;
  *width = s->levels[level].width;
  *height = s->levels[level].height;
  return 0;
}

double ti_level_downsample(int slide, int level) {
  std::shared_ptr<Slide> s = get_slide(slide);
  if (!s || level < 0 || level >= static_cast<int>(s->levels.size()))
    return -1.0;
  return s->levels[level].downsample;
}

int ti_read_region(int slide, int level, int64_t x, int64_t y, int64_t w,
                   int64_t h, uint8_t* out) {
  std::shared_ptr<Slide> s = get_slide(slide);
  if (!s || level < 0 || level >= static_cast<int>(s->levels.size()))
    return -1;
  const double ds = s->levels[level].downsample;
  return s->read_rect(level, static_cast<int64_t>(x / ds),
                      static_cast<int64_t>(y / ds), w, h, out);
}

int ti_pool_start(int n_threads) {
  g_pool.start(n_threads);
  return 0;
}

void ti_pool_stop() { g_pool.stop(); }

int ti_extract_batch(const TiRequest* reqs, int n, uint8_t* out) {
  if (n <= 0) return 0;
  if (!g_pool.running()) g_pool.start(0);
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < n; ++i) {
    Job job;
    job.req = reqs[i];
    job.out = out;
    job.failures = &failures;
    job.remaining = &remaining;
    job.done_cv = &done_cv;
    job.done_mu = &done_mu;
    g_pool.submit(std::move(job));
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

namespace {

// Writes one directory with the level-0-consistent procedural pattern
// (coordinates scaled by `ds` so every level shows the same smoothed
// content). `tile` > 0 → tiled JPEG page; `tile` == 0 → strip page
// (uncompressed scanlines, like SVS thumbnail/label/macro pages).
int write_pattern_dir(TIFF* tif, int64_t w, int64_t h, int64_t ds, int tile,
                      uint32_t seed, uint32_t subfiletype) {
  TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, static_cast<uint32_t>(w));
  TIFFSetField(tif, TIFFTAG_IMAGELENGTH, static_cast<uint32_t>(h));
  TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
  TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
  TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
  TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
  TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
  if (subfiletype) TIFFSetField(tif, TIFFTAG_SUBFILETYPE, subfiletype);
  auto pixel = [&](int64_t gx, int64_t gy, uint8_t* p) {
    p[0] = static_cast<uint8_t>((gx / 7 + seed) % 256);
    p[1] = static_cast<uint8_t>((gy / 7 + seed * 3) % 256);
    p[2] = static_cast<uint8_t>(((gx + gy) / 11 + seed * 5) % 256);
  };
  if (tile > 0) {
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_JPEG);
    TIFFSetField(tif, TIFFTAG_JPEGQUALITY, 90);
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, static_cast<uint32_t>(tile));
    TIFFSetField(tif, TIFFTAG_TILELENGTH, static_cast<uint32_t>(tile));
    std::vector<uint8_t> buf(static_cast<size_t>(tile) * tile * 3);
    for (int64_t ty = 0; ty < h; ty += tile) {
      for (int64_t tx = 0; tx < w; tx += tile) {
        for (int64_t yy = 0; yy < tile; ++yy)
          for (int64_t xx = 0; xx < tile; ++xx)
            pixel((tx + xx) * ds, (ty + yy) * ds,
                  buf.data() + (yy * tile + xx) * 3);
        if (TIFFWriteTile(tif, buf.data(), static_cast<uint32_t>(tx),
                          static_cast<uint32_t>(ty), 0, 0) < 0)
          return -2;
      }
    }
  } else {
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
    TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, 16);
    std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
    for (int64_t y = 0; y < h; ++y) {
      for (int64_t x = 0; x < w; ++x) pixel(x * ds, y * ds, row.data() + x * 3);
      if (TIFFWriteScanline(tif, row.data(), static_cast<uint32_t>(y), 0) < 0)
        return -2;
    }
  }
  return TIFFWriteDirectory(tif) ? 0 : -3;
}

}  // namespace

int ti_write_synthetic(const char* path, int64_t width, int64_t height,
                       int levels, int tile, uint32_t seed) {
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return -1;
  int rc = 0;
  for (int lvl = 0; lvl < levels && rc == 0; ++lvl) {
    rc = write_pattern_dir(tif, width >> lvl, height >> lvl,
                           static_cast<int64_t>(1) << lvl, tile, seed,
                           lvl > 0 ? FILETYPE_REDUCEDIMAGE : 0);
  }
  TIFFClose(tif);
  return rc;
}

int ti_write_synthetic_svs(const char* path, int64_t width, int64_t height,
                           int levels, int tile, uint32_t seed) {
  // Realistic Aperio SVS directory layout: base (tiled, no SUBFILETYPE),
  // then a STRIP thumbnail as directory 1, then the tiled reduced levels
  // (Aperio levels carry no SUBFILETYPE either), then strip label/macro
  // pages with non-tissue aspect ratios. Exercises the level-detection
  // logic in ti_open against the real-world ordering.
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return -1;
  int rc = write_pattern_dir(tif, width, height, 1, tile, seed, 0);
  const int64_t tds = static_cast<int64_t>(1) << levels;
  if (rc == 0)  // strip thumbnail, same aspect as the tissue image
    rc = write_pattern_dir(tif, width / tds, height / tds, tds, 0, seed, 0);
  for (int lvl = 1; lvl < levels && rc == 0; ++lvl)
    rc = write_pattern_dir(tif, width >> lvl, height >> lvl,
                           static_cast<int64_t>(1) << lvl, tile, seed, 0);
  if (rc == 0)  // label page: strip, square-ish aspect
    rc = write_pattern_dir(tif, 96, 96, 1, 0, seed, 0);
  if (rc == 0)  // macro page: strip, wide aspect, flagged reduced
    rc = write_pattern_dir(tif, 320, 80, 1, 0, seed, FILETYPE_REDUCEDIMAGE);
  TIFFClose(tif);
  return rc;
}

int ti_transcode(const char* src, const char* dst, int tile, int quality,
                 int n_threads) {
  if (tile <= 0 || tile % 16 != 0 || quality < 1 || quality > 100) return -1;
  const int sid = ti_open(src);
  if (sid < 0) return -1;
  std::shared_ptr<Slide> slide = get_slide(sid);
  // BigTIFF ("w8"): a 40GP level 0 at JPEG q90 exceeds classic TIFF's 4 GB
  // offsets; our reader (and any libtiff >= 4) reads BigTIFF transparently.
  TIFF* out = TIFFOpen(dst, "w8");
  if (!out) {
    ti_close(sid);
    return -2;
  }
  int nth = n_threads > 0
                ? n_threads
                : static_cast<int>(std::thread::hardware_concurrency());
  nth = std::max(1, nth);
  int rc = 0;
  for (size_t lvl = 0; lvl < slide->levels.size() && rc == 0; ++lvl) {
    const int64_t w = slide->levels[lvl].width;
    const int64_t h = slide->levels[lvl].height;
    const int64_t wpad = (w + tile - 1) / tile * tile;
    TIFFSetField(out, TIFFTAG_IMAGEWIDTH, static_cast<uint32_t>(w));
    TIFFSetField(out, TIFFTAG_IMAGELENGTH, static_cast<uint32_t>(h));
    TIFFSetField(out, TIFFTAG_SAMPLESPERPIXEL, 3);
    TIFFSetField(out, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(out, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
    TIFFSetField(out, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(out, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
    TIFFSetField(out, TIFFTAG_COMPRESSION, COMPRESSION_JPEG);
    TIFFSetField(out, TIFFTAG_JPEGQUALITY, quality);
    TIFFSetField(out, TIFFTAG_TILEWIDTH, static_cast<uint32_t>(tile));
    TIFFSetField(out, TIFFTAG_TILELENGTH, static_cast<uint32_t>(tile));
    if (lvl > 0) TIFFSetField(out, TIFFTAG_SUBFILETYPE, FILETYPE_REDUCEDIMAGE);

    // Stripe pipeline: workers decode (wpad x tile) source stripes in
    // parallel (the expensive part for MIRAX — each stripe decodes every
    // overlapping camera tile exactly once); the calling thread cuts and
    // writes tiles strictly in order (TIFF handles are not thread-safe).
    std::mutex mu;
    std::condition_variable cv;
    int64_t next_ty = 0;
    std::map<int64_t, std::pair<int, std::vector<uint8_t>>> ready;
    // Bound TOTAL resident stripes (queued + in-flight): a real slide's
    // level-0 stripe is wpad*tile*3 bytes (~115 MB at 150k px wide), and
    // the single-threaded TIFF writer is usually the bottleneck — without
    // counting in-flight decodes a many-core host parks ~2x n_threads
    // stripes in RAM and OOMs.
    const size_t depth = static_cast<size_t>(std::min(nth, 8)) + 2;
    size_t in_flight = 0;
    bool abort_flag = false;

    auto worker = [&]() {
      for (;;) {
        int64_t ty;
        {
          std::unique_lock<std::mutex> lk(mu);
          cv.wait(lk, [&] {
            return abort_flag || next_ty >= h ||
                   ready.size() + in_flight < depth;
          });
          if (abort_flag || next_ty >= h) return;
          ty = next_ty;
          next_ty += tile;
          ++in_flight;
        }
        std::vector<uint8_t> buf(static_cast<size_t>(wpad) * tile * 3);
        const int r = slide->read_rect(static_cast<int>(lvl), 0, ty, wpad,
                                       tile, buf.data());
        {
          std::lock_guard<std::mutex> lk(mu);
          ready.emplace(ty, std::make_pair(r, std::move(buf)));
          --in_flight;
        }
        cv.notify_all();
      }
    };
    std::vector<std::thread> pool;
    for (int i = 0; i < nth; ++i) pool.emplace_back(worker);

    std::vector<uint8_t> tbuf(static_cast<size_t>(tile) * tile * 3);
    for (int64_t ty = 0; ty < h && rc == 0; ty += tile) {
      std::pair<int, std::vector<uint8_t>> stripe;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return ready.count(ty) > 0; });
        stripe = std::move(ready[ty]);
        ready.erase(ty);
      }
      cv.notify_all();
      if (stripe.first != 0) {
        rc = -4;
        break;
      }
      for (int64_t tx = 0; tx < w; tx += tile) {
        for (int64_t yy = 0; yy < tile; ++yy)
          std::memcpy(
              tbuf.data() + static_cast<size_t>(yy) * tile * 3,
              stripe.second.data() +
                  (static_cast<size_t>(yy) * wpad + tx) * 3,
              static_cast<size_t>(tile) * 3);
        if (TIFFWriteTile(out, tbuf.data(), static_cast<uint32_t>(tx),
                          static_cast<uint32_t>(ty), 0, 0) < 0) {
          rc = -5;
          break;
        }
      }
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      abort_flag = true;
    }
    cv.notify_all();
    for (std::thread& t : pool) t.join();
    if (rc == 0) rc = TIFFWriteDirectory(out) ? 0 : -3;
  }
  TIFFClose(out);
  ti_close(sid);
  if (rc != 0) std::remove(dst);  // never leave a truncated pyramid behind
  return rc;
}

}  // extern "C"
