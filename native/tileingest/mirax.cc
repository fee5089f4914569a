// MIRAX (.mrxs) backend — a native reader for the 3DHISTECH/Zeiss MIRAX
// directory format, replacing OpenSlide's mirax vendor driver in the
// reference's read path (reference: utils.py:176 ``slide.read_region`` via
// ``openslide.open_slide``; the CARMEL cohorts are .mrxs,
// datasets.py:1083-1086, 1122).
//
// Format (as publicly documented by the OpenSlide project and implemented
// by its mirax driver):
//
//   NAME.mrxs                 stub file (content ignored)
//   NAME/Slidedat.ini         INI metadata
//   NAME/Index.dat            binary tile directory
//   NAME/Data%04d.dat         concatenated JPEG tiles + misc blobs
//
// Slidedat.ini keys used here:
//   [GENERAL]      SLIDE_ID, IMAGENUMBER_X/Y (camera grid),
//                  CameraImageDivisionsPerSide (tiles per camera side, d)
//   [HIERARCHICAL] HIER_COUNT, NONHIER_COUNT, INDEXFILE,
//                  HIER_i_NAME / HIER_i_COUNT / HIER_i_VAL_j_SECTION,
//                  NONHIER_i_NAME / NONHIER_i_COUNT
//   level section  DIGITIZER_WIDTH/HEIGHT (stored tile pixels),
//                  OVERLAP_X/Y (camera overlap, level-0 px), IMAGE_FORMAT
//   [DATAFILE]     FILE_COUNT, FILE_i
//
// Index.dat: 5-byte version string, then the SLIDE_ID string, then two
// little-endian int32 offsets (hierarchical root, nonhierarchical root).
// Each root is an array of int32 page-list offsets, one per (layer, value)
// in declaration order. A page is: int32 entry_count, int32 next_page
// (0 = end), then entry_count records of four int32
// {image_number, offset, length, fileno}.
//
// Geometry: the slide is a mosaic of camera images on a grid of
// IMAGENUMBER_X x IMAGENUMBER_Y positions, each divided into d x d stored
// tiles of DIGITIZER_WIDTH x HEIGHT px. Camera level-0 pixel positions come
// from the VIMSLIDE_POSITION_BUFFER nonhier blob (9 bytes per camera:
// uint8 flag, int32 x, int32 y, row-major) — adjacent cameras OVERLAP, so
// positions are authoritative. MIRAX >= 2.2 exports store the same records
// zlib-compressed under the StitchingIntensityLayer nonhier layer instead
// (OpenSlide's mirax driver handles both; so do we). A regular grid with
// OVERLAP_X/Y spacing is the fallback when neither buffer is present.
// Zoom level n stores one tile image per 2^n x 2^n tile-grid block
// (image_number = top-left cell), downsampled by 2^n; tiles are painted at
// position/2^n and later tiles overwrite earlier ones in the overlap
// bands, exactly like OpenSlide's painting order.
//
// Tile payloads: IMAGE_FORMAT is per zoom-level section — JPEG (libjpeg),
// PNG (libpng, RGB/RGBA/gray/palette normalized to RGB8), or BMP24
// (uncompressed bottom-up BGR). Anything else is a loud nullptr, never
// garbage.

#include "mirax.h"

#include <fcntl.h>
#include <unistd.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <vector>

#include <cerrno>
#include <csetjmp>
#include <cstdlib>
#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

// File-scope JPEG plumbing, shared by the reader (namespace tileingest) and
// the extern "C" fixture writer below.
namespace {

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

// Decodes a JPEG into caller-allocated RGB8 of exactly (w, h); fails on a
// dimension mismatch rather than writing out of bounds.
bool decode_jpeg(const uint8_t* buf, size_t len, int64_t w, int64_t h,
                 uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_width != static_cast<JDIMENSION>(w) ||
      cinfo.output_height != static_cast<JDIMENSION>(h) ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---- PNG (libpng, in-memory source) ----------------------------------------

struct PngSrc {
  const uint8_t* p;
  size_t left;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngSrc* s = static_cast<PngSrc*>(png_get_io_ptr(png));
  if (n > s->left) {
    png_error(png, "short read");
    return;
  }
  std::memcpy(out, s->p, n);
  s->p += n;
  s->left -= n;
}

// Decodes a PNG into caller-allocated RGB8 of exactly (w, h); normalizes
// palette/gray/alpha/16-bit inputs to RGB8 (MIRAX PNG exports are RGB, but
// libpng's transforms make the general case free). Fails on a dimension
// mismatch rather than writing out of bounds.
bool decode_png(const uint8_t* buf, size_t len, int64_t w, int64_t h,
                uint8_t* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8) != 0) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngSrc src{buf, len};
  png_set_read_fn(png, &src, png_mem_read);
  png_read_info(png, info);
  if (png_get_image_width(png, info) != static_cast<png_uint_32>(w) ||
      png_get_image_height(png, info) != static_cast<png_uint_32>(h)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  // Normalize every color type to 8-bit RGB.
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_set_strip_16(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != static_cast<size_t>(w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  rows.resize(static_cast<size_t>(h));
  for (int64_t y = 0; y < h; ++y)
    rows[y] = out + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---- BMP24 (uncompressed bottom-up BGR, the MIRAX BMP24 export) -------------

uint32_t bmp_le32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

bool decode_bmp24(const uint8_t* buf, size_t len, int64_t w, int64_t h,
                  uint8_t* out) {
  if (len < 54 || buf[0] != 'B' || buf[1] != 'M') return false;
  const uint32_t pix_off = bmp_le32(buf + 10);
  const int32_t bw = static_cast<int32_t>(bmp_le32(buf + 18));
  const int32_t bh = static_cast<int32_t>(bmp_le32(buf + 22));  // <0: top-down
  const uint16_t bpp = static_cast<uint16_t>(buf[28] | (buf[29] << 8));
  const uint32_t compression = bmp_le32(buf + 30);
  if (bw != w || (bh != h && bh != -h) || bpp != 24 || compression != 0)
    return false;
  const size_t stride = (static_cast<size_t>(w) * 3 + 3) & ~size_t{3};
  if (pix_off + stride * h > len) return false;
  const bool bottom_up = bh > 0;
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* row = buf + pix_off + stride * (bottom_up ? h - 1 - y : y);
    uint8_t* dst = out + static_cast<size_t>(y) * w * 3;
    for (int64_t x = 0; x < w; ++x) {  // BGR -> RGB
      dst[x * 3 + 0] = row[x * 3 + 2];
      dst[x * 3 + 1] = row[x * 3 + 1];
      dst[x * 3 + 2] = row[x * 3 + 0];
    }
  }
  return true;
}

}  // namespace

namespace tileingest {
namespace {

// ---- tiny INI parser --------------------------------------------------------

struct Ini {
  // section -> key -> value (whitespace-trimmed; keys case-sensitive like
  // the real files).
  std::map<std::string, std::map<std::string, std::string>> sections;

  const std::string* get(const std::string& sec, const std::string& key) const {
    auto s = sections.find(sec);
    if (s == sections.end()) return nullptr;
    auto k = s->second.find(key);
    if (k == s->second.end()) return nullptr;
    return &k->second;
  }

  std::string str(const std::string& sec, const std::string& key,
                  const std::string& dflt = "") const {
    const std::string* v = get(sec, key);
    return v ? *v : dflt;
  }

  long num(const std::string& sec, const std::string& key,
           long dflt = -1) const {
    const std::string* v = get(sec, key);
    if (!v) return dflt;
    try {
      return std::stol(*v);
    } catch (...) {
      return dflt;
    }
  }

  double real(const std::string& sec, const std::string& key,
              double dflt = 0.0) const {
    const std::string* v = get(sec, key);
    if (!v) return dflt;
    try {
      return std::stod(*v);
    } catch (...) {
      return dflt;
    }
  }
};

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n\xef\xbb\xbf");
  size_t b = s.find_last_not_of(" \t\r\n");
  return a == std::string::npos ? "" : s.substr(a, b - a + 1);
}

bool parse_ini(const std::string& path, Ini* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::string line, section;
  while (std::getline(f, line)) {
    line = trim(line);
    if (line.empty() || line[0] == ';' || line[0] == '#') continue;
    if (line.front() == '[' && line.back() == ']') {
      section = line.substr(1, line.size() - 2);
      continue;
    }
    size_t eq = line.find('=');
    if (eq == std::string::npos) continue;
    out->sections[section][trim(line.substr(0, eq))] =
        trim(line.substr(eq + 1));
  }
  return true;
}

// ---- Index.dat --------------------------------------------------------------

int32_t le32(const uint8_t* p) {
  return static_cast<int32_t>(static_cast<uint32_t>(p[0]) |
                              (static_cast<uint32_t>(p[1]) << 8) |
                              (static_cast<uint32_t>(p[2]) << 16) |
                              (static_cast<uint32_t>(p[3]) << 24));
}

struct IndexEntry {
  int32_t image = 0;  // tile-grid cell number (top-left for zoom levels)
  int32_t offset = 0;
  int32_t length = 0;
  int32_t fileno = 0;
};

// Walks the page chain rooted at the int32 pointer stored at
// root + 4*record and appends every entry.
bool read_record_entries(const std::vector<uint8_t>& idx, int32_t root,
                         int record, std::vector<IndexEntry>* out) {
  const size_t ptr_at = static_cast<size_t>(root) + 4 * record;
  if (ptr_at + 4 > idx.size()) return false;
  int32_t page = le32(idx.data() + ptr_at);
  // Cycle/corruption guard: a well-formed chain cannot have more pages than
  // the file has 8-byte headers — a self- or back-pointing next_page in a
  // corrupt Index.dat must fail loudly, not hang ti_open.
  size_t pages_left = idx.size() / 8 + 1;
  while (page != 0) {
    if (pages_left-- == 0) return false;
    if (static_cast<size_t>(page) + 8 > idx.size()) return false;
    const int32_t count = le32(idx.data() + page);
    const int32_t next = le32(idx.data() + page + 4);
    size_t p = static_cast<size_t>(page) + 8;
    if (count < 0 || p + 16ull * count > idx.size()) return false;
    for (int32_t i = 0; i < count; ++i, p += 16) {
      IndexEntry e;
      e.image = le32(idx.data() + p);
      e.offset = le32(idx.data() + p + 4);
      e.length = le32(idx.data() + p + 8);
      e.fileno = le32(idx.data() + p + 12);
      out->push_back(e);
    }
    page = next;
  }
  return true;
}

// ---- the slide ---------------------------------------------------------------

struct MiraxTile {
  int64_t px = 0;  // level-0 position, origin-corrected
  int64_t py = 0;
  int64_t offset = 0;
  int64_t length = 0;
  int32_t fileno = 0;
};

enum class TileFormat { kJpeg, kPng, kBmp24 };

struct MiraxLevel {
  int64_t tw = 0;  // stored tile pixels
  int64_t th = 0;
  TileFormat format = TileFormat::kJpeg;
  std::vector<MiraxTile> tiles;  // sorted by (py, px)
};

bool decode_tile(TileFormat fmt, const uint8_t* buf, size_t len, int64_t w,
                 int64_t h, uint8_t* out) {
  switch (fmt) {
    case TileFormat::kJpeg:
      return decode_jpeg(buf, len, w, h, out);
    case TileFormat::kPng:
      return decode_png(buf, len, w, h, out);
    case TileFormat::kBmp24:
      return decode_bmp24(buf, len, w, h, out);
  }
  return false;
}

// IMAGE_FORMAT values as written by the scanner software (OpenSlide's mirax
// driver accepts exactly these three).
bool parse_tile_format(const std::string& s, TileFormat* out) {
  if (s == "JPEG") {
    *out = TileFormat::kJpeg;
    return true;
  }
  if (s == "PNG") {
    *out = TileFormat::kPng;
    return true;
  }
  if (s == "BMP24") {
    *out = TileFormat::kBmp24;
    return true;
  }
  return false;
}

struct MiraxSlide : Slide {
  // Data files are opened LAZILY on first read (a sampler can hold hundreds
  // of slides x tens of Data%04d.dat each — eager fds would exhaust the
  // ulimit; the TIFF backend's per-thread handles are lazy the same way).
  // fd states: -2 = not yet opened, -1 = open failed, >=0 = usable.
  std::vector<std::string> data_files;
  std::vector<int> fds;
  std::mutex fds_mu;
  std::vector<MiraxLevel> zoom;

  ~MiraxSlide() override {
    for (int fd : fds)
      if (fd >= 0) ::close(fd);
  }

  int fd_for(int fileno) {
    std::lock_guard<std::mutex> lk(fds_mu);
    if (fileno < 0 || fileno >= static_cast<int>(fds.size())) return -1;
    if (fds[fileno] == -2)
      fds[fileno] = ::open(data_files[fileno].c_str(), O_RDONLY);
    return fds[fileno];
  }

  int read_rect(int level, int64_t x0, int64_t y0, int64_t w, int64_t h,
                uint8_t* out) override {
    if (level < 0 || level >= static_cast<int>(zoom.size())) return -1;
    std::memset(out, 0, static_cast<size_t>(w) * h * 3);
    const MiraxLevel& lv = zoom[level];
    const int64_t ds = static_cast<int64_t>(1) << level;
    // Candidate band by level-0 y (tiles sorted by py): a tile intersects
    // [y0, y0+h) at this level iff py/ds + th > y0 and py/ds < y0 + h.
    const int64_t lo = (y0 - lv.th) * ds;  // py > (y0 - th) * ds
    const int64_t hi = (y0 + h) * ds;      // py < (y0 + h) * ds
    auto first = std::lower_bound(
        lv.tiles.begin(), lv.tiles.end(), lo,
        [](const MiraxTile& t, int64_t v) { return t.py <= v; });
    std::vector<uint8_t> rgb(static_cast<size_t>(lv.tw) * lv.th * 3);
    std::vector<uint8_t> raw;
    for (auto it = first; it != lv.tiles.end() && it->py < hi; ++it) {
      const int64_t tx = it->px / ds;
      const int64_t ty = it->py / ds;
      // Clamp to both the request and the level extent: edge tiles of the
      // downsampled zoom levels overhang the slide (they cover 2^n grid
      // cells whether or not all exist) — out-of-bounds stays zero-filled.
      const int64_t cx0 = std::max(tx, x0);
      const int64_t cy0 = std::max(ty, y0);
      const int64_t cx1 =
          std::min({tx + lv.tw, x0 + w, levels[level].width});
      const int64_t cy1 =
          std::min({ty + lv.th, y0 + h, levels[level].height});
      if (cx0 >= cx1 || cy0 >= cy1) continue;
      const int fd = fd_for(it->fileno);
      if (fd < 0) return -7;
      raw.resize(static_cast<size_t>(it->length));
      if (pread(fd, raw.data(), raw.size(),
                static_cast<off_t>(it->offset)) !=
          static_cast<ssize_t>(raw.size()))
        return -7;
      if (!decode_tile(lv.format, raw.data(), raw.size(), lv.tw, lv.th,
                       rgb.data()))
        return -7;
      for (int64_t yy = cy0; yy < cy1; ++yy) {
        const uint8_t* src = rgb.data() + ((yy - ty) * lv.tw + (cx0 - tx)) * 3;
        uint8_t* dst = out + ((yy - y0) * w + (cx0 - x0)) * 3;
        std::memcpy(dst, src, static_cast<size_t>(cx1 - cx0) * 3);
      }
    }
    return 0;
  }
};

}  // namespace

Slide* mirax_open(const char* cpath) {
  const std::string path(cpath);
  const size_t dot = path.find_last_of('.');
  if (dot == std::string::npos) return nullptr;
  const std::string datadir = path.substr(0, dot);

  Ini ini;
  if (!parse_ini(datadir + "/Slidedat.ini", &ini)) return nullptr;

  const std::string G = "GENERAL", H = "HIERARCHICAL", D = "DATAFILE";
  const long cam_x = ini.num(G, "IMAGENUMBER_X");
  const long cam_y = ini.num(G, "IMAGENUMBER_Y");
  long divisions = ini.num(G, "CameraImageDivisionsPerSide", 1);
  if (cam_x <= 0 || cam_y <= 0) return nullptr;
  if (divisions <= 0) divisions = 1;
  const int64_t gridw = cam_x * divisions;

  // Find the zoom-level hierarchy and the per-level sections.
  const long hier_count = ini.num(H, "HIER_COUNT", 0);
  const long nonhier_count = ini.num(H, "NONHIER_COUNT", 0);
  int zoom_hier = -1;
  long zoom_levels = 0;
  int zoom_record0 = 0;  // index of the hier's first record in the root array
  {
    int rec = 0;
    for (long i = 0; i < hier_count; ++i) {
      char key[64];
      std::snprintf(key, sizeof(key), "HIER_%ld_NAME", i);
      const std::string name = ini.str(H, key);
      std::snprintf(key, sizeof(key), "HIER_%ld_COUNT", i);
      const long count = ini.num(H, key, 0);
      if (name == "Slide zoom level") {
        zoom_hier = static_cast<int>(i);
        zoom_levels = count;
        zoom_record0 = rec;
      }
      rec += static_cast<int>(count);
    }
  }
  if (zoom_hier < 0 || zoom_levels <= 0) return nullptr;

  // Data files.
  const long file_count = ini.num(D, "FILE_COUNT", 0);
  if (file_count <= 0) return nullptr;
  std::vector<std::string> data_files;
  for (long i = 0; i < file_count; ++i) {
    char key[32];
    std::snprintf(key, sizeof(key), "FILE_%ld", i);
    std::string name = ini.str(D, key);
    if (name.empty()) return nullptr;
    data_files.push_back(datadir + "/" + name);
  }

  // Index.dat.
  std::vector<uint8_t> idx;
  {
    const std::string index_name = ini.str(H, "INDEXFILE", "Index.dat");
    std::ifstream f(datadir + "/" + index_name, std::ios::binary);
    if (!f) return nullptr;
    idx.assign(std::istreambuf_iterator<char>(f),
               std::istreambuf_iterator<char>());
  }
  const std::string slide_id = ini.str(G, "SLIDE_ID");
  const size_t hdr = 5 + slide_id.size();
  if (idx.size() < hdr + 8) return nullptr;
  // The slide id embedded in Index.dat must match Slidedat.ini (OpenSlide
  // verifies this; a mismatch means a mixed-up export).
  if (!slide_id.empty() &&
      std::memcmp(idx.data() + 5, slide_id.data(), slide_id.size()) != 0)
    return nullptr;
  const int32_t hier_root = le32(idx.data() + hdr);
  const int32_t nonhier_root = le32(idx.data() + hdr + 4);

  // Camera positions: VIMSLIDE_POSITION_BUFFER if present, else the regular
  // grid with the level-0 OVERLAP spacing.
  char key[64];
  std::snprintf(key, sizeof(key), "HIER_%d_VAL_0_SECTION", zoom_hier);
  const std::string lvl0_sec = ini.str(H, key);
  const int64_t t0w = ini.num(lvl0_sec, "DIGITIZER_WIDTH");
  const int64_t t0h = ini.num(lvl0_sec, "DIGITIZER_HEIGHT");
  if (t0w <= 0 || t0h <= 0) return nullptr;
  TileFormat fmt0;
  if (!parse_tile_format(ini.str(lvl0_sec, "IMAGE_FORMAT", "JPEG"), &fmt0))
    return nullptr;  // unknown payload format — fail loudly, never garbage

  auto slide = std::make_unique<MiraxSlide>();
  slide->path = path;
  slide->data_files = data_files;
  slide->fds.assign(data_files.size(), -2);  // lazy: opened on first read

  std::vector<int64_t> cam_px(cam_x * cam_y), cam_py(cam_x * cam_y);
  std::vector<bool> cam_ok(cam_x * cam_y, false);
  bool have_positions = false;
  {
    const size_t want = static_cast<size_t>(9) * cam_x * cam_y;
    int rec = 0;
    for (long i = 0; i < nonhier_count && !have_positions; ++i) {
      std::snprintf(key, sizeof(key), "NONHIER_%ld_NAME", i);
      const std::string name = ini.str(H, key);
      std::snprintf(key, sizeof(key), "NONHIER_%ld_COUNT", i);
      const long count = ini.num(H, key, 1);
      // VIMSLIDE_POSITION_BUFFER stores the 9-byte records raw;
      // StitchingIntensityLayer (MIRAX >= 2.2) stores the same records
      // zlib-compressed. OpenSlide's mirax driver tries exactly these two.
      const bool raw_pos = name == "VIMSLIDE_POSITION_BUFFER";
      const bool zlib_pos = name == "StitchingIntensityLayer";
      if (raw_pos || zlib_pos) {
        std::vector<IndexEntry> es;
        if (read_record_entries(idx, nonhier_root, rec, &es) && !es.empty()) {
          const IndexEntry& e = es[0];
          if (e.fileno >= 0 && e.fileno < file_count && e.length > 0 &&
              (!raw_pos || static_cast<size_t>(e.length) >= want)) {
            std::vector<uint8_t> buf(e.length);
            const int fd = slide->fd_for(e.fileno);
            if (fd >= 0 && pread(fd, buf.data(), buf.size(),
                                 static_cast<off_t>(e.offset)) ==
                               static_cast<ssize_t>(buf.size())) {
              bool ok = raw_pos;
              if (zlib_pos) {
                std::vector<uint8_t> inflated(want);
                uLongf dlen = static_cast<uLongf>(want);
                ok = uncompress(inflated.data(), &dlen, buf.data(),
                                static_cast<uLong>(buf.size())) == Z_OK &&
                     dlen == want;
                if (ok) buf = std::move(inflated);
              }
              if (ok) {
                for (long c = 0; c < cam_x * cam_y; ++c) {
                  const uint8_t* p = buf.data() + 9 * c;
                  cam_ok[c] = p[0] != 0;
                  cam_px[c] = le32(p + 1);
                  cam_py[c] = le32(p + 5);
                }
                have_positions = true;
              }
            }
          }
        }
      }
      rec += static_cast<int>(count);
    }
  }
  if (!have_positions) {
    const double ox = ini.real(lvl0_sec, "OVERLAP_X", 0.0);
    const double oy = ini.real(lvl0_sec, "OVERLAP_Y", 0.0);
    const int64_t adv_x = divisions * t0w - static_cast<int64_t>(ox);
    const int64_t adv_y = divisions * t0h - static_cast<int64_t>(oy);
    for (long cy = 0; cy < cam_y; ++cy)
      for (long cx = 0; cx < cam_x; ++cx) {
        cam_ok[cy * cam_x + cx] = true;
        cam_px[cy * cam_x + cx] = cx * adv_x;
        cam_py[cy * cam_x + cx] = cy * adv_y;
      }
  }

  // Zoom levels: resolve entries -> positioned tiles.
  int64_t minx = INT64_MAX, miny = INT64_MAX, maxx = INT64_MIN,
          maxy = INT64_MIN;
  slide->zoom.resize(zoom_levels);
  for (long z = 0; z < zoom_levels; ++z) {
    std::snprintf(key, sizeof(key), "HIER_%d_VAL_%ld_SECTION", zoom_hier, z);
    const std::string sec = ini.str(H, key);
    MiraxLevel& lv = slide->zoom[z];
    lv.tw = ini.num(sec, "DIGITIZER_WIDTH", t0w);
    lv.th = ini.num(sec, "DIGITIZER_HEIGHT", t0h);
    lv.format = fmt0;
    if (const std::string* f = ini.get(sec, "IMAGE_FORMAT")) {
      if (!parse_tile_format(*f, &lv.format)) return nullptr;
    }
    std::vector<IndexEntry> es;
    if (!read_record_entries(idx, hier_root,
                             zoom_record0 + static_cast<int>(z), &es))
      return nullptr;
    for (const IndexEntry& e : es) {
      if (e.image < 0 || e.length <= 0) continue;
      const int64_t gx = e.image % gridw;
      const int64_t gy = e.image / gridw;
      const long cam = static_cast<long>((gy / divisions) * cam_x +
                                         gx / divisions);
      if (cam < 0 || cam >= cam_x * cam_y || !cam_ok[cam]) continue;
      MiraxTile t;
      t.px = cam_px[cam] + (gx % divisions) * t0w;
      t.py = cam_py[cam] + (gy % divisions) * t0h;
      t.offset = static_cast<int64_t>(e.offset);
      t.length = static_cast<int64_t>(e.length);
      t.fileno = e.fileno;
      lv.tiles.push_back(t);
      // Slide extent comes from the LEVEL-0 mosaic only (OpenSlide
      // semantics): higher zoom levels cover whole 2^n x 2^n blocks and
      // overhang the tissue edge — counting them would inflate the dims.
      if (z == 0) {
        minx = std::min(minx, t.px);
        miny = std::min(miny, t.py);
        maxx = std::max(maxx, t.px + lv.tw);
        maxy = std::max(maxy, t.py + lv.th);
      }
    }
  }
  if (minx == INT64_MAX) return nullptr;  // no tiles at all

  // Shift everything to a (0, 0) origin and sort for the band search.
  for (MiraxLevel& lv : slide->zoom) {
    for (MiraxTile& t : lv.tiles) {
      t.px -= minx;
      t.py -= miny;
    }
    std::sort(lv.tiles.begin(), lv.tiles.end(),
              [](const MiraxTile& a, const MiraxTile& b) {
                return a.py != b.py ? a.py < b.py : a.px < b.px;
              });
  }
  const int64_t w0 = maxx - minx, h0 = maxy - miny;
  for (long z = 0; z < zoom_levels; ++z) {
    const int64_t ds = static_cast<int64_t>(1) << z;
    Level L;
    L.dir = z;
    L.width = (w0 + ds - 1) / ds;
    L.height = (h0 + ds - 1) / ds;
    L.downsample = static_cast<double>(ds);
    slide->levels.push_back(L);
  }
  return slide.release();
}

}  // namespace tileingest

// ---- synthetic fixture ---------------------------------------------------------

namespace {

// Same deterministic pattern as tileingest.cc write_pattern_dir — smooth
// enough that JPEG q95 stays within a few grey levels.
void pattern_pixel(int64_t gx, int64_t gy, uint32_t seed, uint8_t* p) {
  p[0] = static_cast<uint8_t>((gx / 7 + seed) % 256);
  p[1] = static_cast<uint8_t>((gy / 7 + seed * 3) % 256);
  p[2] = static_cast<uint8_t>(((gx + gy) / 11 + seed * 5) % 256);
}

bool encode_jpeg(const uint8_t* rgb, int w, int h,
                 std::vector<uint8_t>* out) {
  jpeg_compress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = jpeg_err_exit;
  unsigned char* mem = nullptr;
  unsigned long mem_size = 0;
  if (setjmp(err.jb)) {
    jpeg_destroy_compress(&cinfo);
    if (mem) free(mem);
    return false;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &mem, &mem_size);
  cinfo.image_width = static_cast<JDIMENSION>(w);
  cinfo.image_height = static_cast<JDIMENSION>(h);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, 95, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(
        rgb + static_cast<size_t>(cinfo.next_scanline) * w * 3);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  out->assign(mem, mem + mem_size);
  free(mem);
  return true;
}

void put32(std::vector<uint8_t>* v, int32_t x) {
  v->push_back(static_cast<uint8_t>(x & 0xff));
  v->push_back(static_cast<uint8_t>((x >> 8) & 0xff));
  v->push_back(static_cast<uint8_t>((x >> 16) & 0xff));
  v->push_back(static_cast<uint8_t>((x >> 24) & 0xff));
}

}  // namespace

extern "C" int ti_write_synthetic_mrxs(const char* cpath, int64_t width,
                                       int64_t height, int levels, int tile,
                                       uint32_t seed) {
  const std::string path(cpath);
  const size_t dot = path.find_last_of('.');
  if (dot == std::string::npos || levels < 1 || tile < 16) return -1;
  const std::string datadir = path.substr(0, dot);
  if (mkdir(datadir.c_str(), 0755) != 0 && errno != EEXIST) return -1;

  // Geometry: divisions=1, camera tile = `tile` px, cameras overlap by
  // tile/8 (divisible by 2^(levels-1) for tile>=16, levels<=4 — keeps every
  // position divisible by the level downsample so the painted mosaic equals
  // the analytic pattern exactly, modulo JPEG error).
  const int64_t overlap = tile / 8;
  const int64_t adv = tile - overlap;
  const int64_t nx = std::max<int64_t>((width - overlap + adv - 1) / adv, 1);
  const int64_t ny = std::max<int64_t>((height - overlap + adv - 1) / adv, 1);

  std::vector<uint8_t> data;  // Data0000.dat contents
  struct TileRec {
    int32_t image, offset, length;
  };
  std::vector<std::vector<TileRec>> recs(levels);
  std::vector<uint8_t> rgb(static_cast<size_t>(tile) * tile * 3);
  std::vector<uint8_t> jpg;
  for (int z = 0; z < levels; ++z) {
    const int64_t ds = static_cast<int64_t>(1) << z;
    for (int64_t gy = 0; gy < ny; gy += ds) {
      for (int64_t gx = 0; gx < nx; gx += ds) {
        const int64_t px = gx * adv, py = gy * adv;  // level-0 position
        for (int64_t yy = 0; yy < tile; ++yy)
          for (int64_t xx = 0; xx < tile; ++xx)
            pattern_pixel(px + xx * ds, py + yy * ds, seed,
                          rgb.data() + (yy * tile + xx) * 3);
        if (!encode_jpeg(rgb.data(), tile, tile, &jpg)) return -2;
        recs[z].push_back({static_cast<int32_t>(gy * nx + gx),
                           static_cast<int32_t>(data.size()),
                           static_cast<int32_t>(jpg.size())});
        data.insert(data.end(), jpg.begin(), jpg.end());
      }
    }
  }

  // Camera position buffer (9 bytes per camera, row-major).
  const int32_t pos_offset = static_cast<int32_t>(data.size());
  for (int64_t gy = 0; gy < ny; ++gy)
    for (int64_t gx = 0; gx < nx; ++gx) {
      data.push_back(1);  // flag: present
      put32(&data, static_cast<int32_t>(gx * adv));
      put32(&data, static_cast<int32_t>(gy * adv));
    }
  const int32_t pos_length = static_cast<int32_t>(9 * nx * ny);

  // Index.dat: header, root arrays, then one page per record.
  char slide_id[64];
  std::snprintf(slide_id, sizeof(slide_id), "SYNTH-%08x", seed);
  std::vector<uint8_t> idx;
  const char* version = "01.02";
  idx.insert(idx.end(), version, version + 5);
  idx.insert(idx.end(), slide_id, slide_id + std::strlen(slide_id));
  const size_t root_ptrs_at = idx.size();
  put32(&idx, 0);  // hier_root placeholder
  put32(&idx, 0);  // nonhier_root placeholder
  const int32_t hier_root = static_cast<int32_t>(idx.size());
  for (int z = 0; z < levels; ++z) put32(&idx, 0);  // per-level page ptrs
  const int32_t nonhier_root = static_cast<int32_t>(idx.size());
  put32(&idx, 0);  // position-buffer page ptr
  // pages
  for (int z = 0; z < levels; ++z) {
    const int32_t page_at = static_cast<int32_t>(idx.size());
    std::memcpy(idx.data() + hier_root + 4 * z, &page_at, 4);
    put32(&idx, static_cast<int32_t>(recs[z].size()));
    put32(&idx, 0);  // no next page
    for (const TileRec& r : recs[z]) {
      put32(&idx, r.image);
      put32(&idx, r.offset);
      put32(&idx, r.length);
      put32(&idx, 0);  // fileno
    }
  }
  {
    const int32_t page_at = static_cast<int32_t>(idx.size());
    std::memcpy(idx.data() + nonhier_root, &page_at, 4);
    put32(&idx, 1);
    put32(&idx, 0);
    put32(&idx, 0);  // image (unused for nonhier)
    put32(&idx, pos_offset);
    put32(&idx, pos_length);
    put32(&idx, 0);  // fileno
  }
  {
    int32_t v = hier_root;
    std::memcpy(idx.data() + root_ptrs_at, &v, 4);
    v = nonhier_root;
    std::memcpy(idx.data() + root_ptrs_at + 4, &v, 4);
  }

  // Slidedat.ini
  std::ostringstream ini;
  ini << "[GENERAL]\n"
      << "SLIDE_VERSION = 1.9\n"
      << "SLIDE_ID = " << slide_id << "\n"
      << "IMAGENUMBER_X = " << nx << "\n"
      << "IMAGENUMBER_Y = " << ny << "\n"
      << "CameraImageDivisionsPerSide = 1\n"
      << "OBJECTIVE_MAGNIFICATION = 20\n"
      << "[HIERARCHICAL]\n"
      << "HIER_COUNT = 1\n"
      << "NONHIER_COUNT = 1\n"
      << "INDEXFILE = Index.dat\n"
      << "HIER_0_NAME = Slide zoom level\n"
      << "HIER_0_COUNT = " << levels << "\n";
  for (int z = 0; z < levels; ++z)
    ini << "HIER_0_VAL_" << z << " = ZoomLevel_" << z << "\n"
        << "HIER_0_VAL_" << z << "_SECTION = LAYER_0_LEVEL_" << z
        << "_SECTION\n";
  ini << "NONHIER_0_NAME = VIMSLIDE_POSITION_BUFFER\n"
      << "NONHIER_0_COUNT = 1\n"
      << "NONHIER_0_VAL_0 = default\n";
  for (int z = 0; z < levels; ++z) {
    ini << "[LAYER_0_LEVEL_" << z << "_SECTION]\n"
        << "DIGITIZER_WIDTH = " << tile << "\n"
        << "DIGITIZER_HEIGHT = " << tile << "\n"
        << "OVERLAP_X = " << static_cast<double>(overlap) << "\n"
        << "OVERLAP_Y = " << static_cast<double>(overlap) << "\n"
        << "IMAGE_FORMAT = JPEG\n"
        << "MICROMETER_PER_PIXEL_X = " << 0.25 * (1 << z) << "\n";
  }
  ini << "[DATAFILE]\n"
      << "FILE_COUNT = 1\n"
      << "FILE_0 = Data0000.dat\n";

  auto write_file = [](const std::string& p, const void* buf, size_t n) {
    std::ofstream f(p, std::ios::binary);
    if (!f) return false;
    f.write(static_cast<const char*>(buf), static_cast<std::streamsize>(n));
    return bool(f);
  };
  const std::string ini_s = ini.str();
  if (!write_file(datadir + "/Slidedat.ini", ini_s.data(), ini_s.size()))
    return -3;
  if (!write_file(datadir + "/Index.dat", idx.data(), idx.size())) return -3;
  if (!write_file(datadir + "/Data0000.dat", data.data(), data.size()))
    return -3;
  const char stub[] = "MIRAX synthetic stub\n";
  if (!write_file(path, stub, sizeof(stub) - 1)) return -3;
  return 0;
}
