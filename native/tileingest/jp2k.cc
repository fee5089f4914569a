// jp2k implementation: dlopen'd libopenjp2 with a hand-declared slice of the
// stable openjpeg 2.x C ABI (the image ships /lib/.../libopenjp2.so.7 but no
// headers). Struct layouts below match openjpeg.h as of 2.1–2.5 — they are
// part of the library's public ABI and have been layout-stable across that
// whole range; the round-trip tests in tests/test_ingest.py validate them
// against PIL's encoder at import time of this path.

#include "jp2k.h"

#include <dlfcn.h>

#include <algorithm>
#include <cstring>
#include <mutex>

namespace {

// ---- openjpeg 2.x ABI (subset) ---------------------------------------------

using OPJ_BOOL = int;
constexpr int OPJ_CODEC_J2K = 0;
constexpr int OPJ_CODEC_JP2 = 2;

struct opj_image_comp_t {
  uint32_t dx, dy, w, h, x0, y0, prec, bpp, sgnd, resno_decoded, factor;
  int32_t* data;
  uint16_t alpha;
};

struct opj_image_t {
  uint32_t x0, y0, x1, y1, numcomps;
  int color_space;
  opj_image_comp_t* comps;
  uint8_t* icc_profile_buf;
  uint32_t icc_profile_len;
};

using opj_stream_read_fn = size_t (*)(void*, size_t, void*);
using opj_stream_skip_fn = int64_t (*)(int64_t, void*);
using opj_stream_seek_fn = OPJ_BOOL (*)(int64_t, void*);
using opj_stream_free_fn = void (*)(void*);

struct OpjApi {
  void* (*create_decompress)(int);
  void (*destroy_codec)(void*);
  void (*set_default_decoder_parameters)(void*);
  OPJ_BOOL (*setup_decoder)(void*, void*);
  void* (*stream_default_create)(OPJ_BOOL);
  void (*stream_destroy)(void*);
  void (*stream_set_read_function)(void*, opj_stream_read_fn);
  void (*stream_set_skip_function)(void*, opj_stream_skip_fn);
  void (*stream_set_seek_function)(void*, opj_stream_seek_fn);
  void (*stream_set_user_data)(void*, void*, opj_stream_free_fn);
  void (*stream_set_user_data_length)(void*, uint64_t);
  OPJ_BOOL (*read_header)(void*, void*, opj_image_t**);
  OPJ_BOOL (*decode)(void*, void*, opj_image_t*);
  OPJ_BOOL (*end_decompress)(void*, void*);
  void (*image_destroy)(opj_image_t*);
  bool ok = false;
};

OpjApi g_api;
std::once_flag g_api_once;

void load_api() {
  void* h = dlopen("libopenjp2.so.7", RTLD_NOW | RTLD_GLOBAL);
  if (!h) h = dlopen("libopenjp2.so", RTLD_NOW | RTLD_GLOBAL);
  if (!h) return;
  auto sym = [h](const char* n) { return dlsym(h, n); };
  g_api.create_decompress =
      reinterpret_cast<void* (*)(int)>(sym("opj_create_decompress"));
  g_api.destroy_codec =
      reinterpret_cast<void (*)(void*)>(sym("opj_destroy_codec"));
  g_api.set_default_decoder_parameters = reinterpret_cast<void (*)(void*)>(
      sym("opj_set_default_decoder_parameters"));
  g_api.setup_decoder =
      reinterpret_cast<OPJ_BOOL (*)(void*, void*)>(sym("opj_setup_decoder"));
  g_api.stream_default_create = reinterpret_cast<void* (*)(OPJ_BOOL)>(
      sym("opj_stream_default_create"));
  g_api.stream_destroy =
      reinterpret_cast<void (*)(void*)>(sym("opj_stream_destroy"));
  g_api.stream_set_read_function =
      reinterpret_cast<void (*)(void*, opj_stream_read_fn)>(
          sym("opj_stream_set_read_function"));
  g_api.stream_set_skip_function =
      reinterpret_cast<void (*)(void*, opj_stream_skip_fn)>(
          sym("opj_stream_set_skip_function"));
  g_api.stream_set_seek_function =
      reinterpret_cast<void (*)(void*, opj_stream_seek_fn)>(
          sym("opj_stream_set_seek_function"));
  g_api.stream_set_user_data =
      reinterpret_cast<void (*)(void*, void*, opj_stream_free_fn)>(
          sym("opj_stream_set_user_data"));
  g_api.stream_set_user_data_length =
      reinterpret_cast<void (*)(void*, uint64_t)>(
          sym("opj_stream_set_user_data_length"));
  g_api.read_header = reinterpret_cast<OPJ_BOOL (*)(void*, void*, opj_image_t**)>(
      sym("opj_read_header"));
  g_api.decode = reinterpret_cast<OPJ_BOOL (*)(void*, void*, opj_image_t*)>(
      sym("opj_decode"));
  g_api.end_decompress =
      reinterpret_cast<OPJ_BOOL (*)(void*, void*)>(sym("opj_end_decompress"));
  g_api.image_destroy =
      reinterpret_cast<void (*)(opj_image_t*)>(sym("opj_image_destroy"));
  g_api.ok = g_api.create_decompress && g_api.destroy_codec &&
             g_api.set_default_decoder_parameters && g_api.setup_decoder &&
             g_api.stream_default_create && g_api.stream_destroy &&
             g_api.stream_set_read_function && g_api.stream_set_skip_function &&
             g_api.stream_set_seek_function && g_api.stream_set_user_data &&
             g_api.stream_set_user_data_length && g_api.read_header &&
             g_api.decode && g_api.end_decompress && g_api.image_destroy;
}

// ---- in-memory stream -------------------------------------------------------

struct MemStream {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

size_t mem_read(void* out, size_t n, void* user) {
  auto* s = static_cast<MemStream*>(user);
  if (s->pos >= s->len) return static_cast<size_t>(-1);  // OPJ EOF convention
  size_t take = std::min(n, s->len - s->pos);
  std::memcpy(out, s->buf + s->pos, take);
  s->pos += take;
  return take;
}

int64_t mem_skip(int64_t n, void* user) {
  auto* s = static_cast<MemStream*>(user);
  if (n < 0) return -1;
  size_t take = std::min<size_t>(static_cast<size_t>(n), s->len - s->pos);
  s->pos += take;
  return static_cast<int64_t>(take);
}

OPJ_BOOL mem_seek(int64_t n, void* user) {
  auto* s = static_cast<MemStream*>(user);
  if (n < 0 || static_cast<size_t>(n) > s->len) return 0;
  s->pos = static_cast<size_t>(n);
  return 1;
}

inline uint8_t clamp_u8(int v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

}  // namespace

bool jp2k_available() {
  std::call_once(g_api_once, load_api);
  return g_api.ok;
}

int jp2k_decode(const uint8_t* buf, size_t len, uint8_t* out, int64_t w,
                int64_t h, bool ycbcr) {
  if (!jp2k_available() || len < 4) return -1;
  // Sniff container: raw J2K codestream starts FF 4F FF 51; anything else
  // with a JP2 signature box goes through the JP2 codec.
  int fmt = (buf[0] == 0xFF && buf[1] == 0x4F) ? OPJ_CODEC_J2K : OPJ_CODEC_JP2;
  void* codec = g_api.create_decompress(fmt);
  if (!codec) return -2;
  // opj_dparameters_t is large and version-dependent; a zeroed 16 KB arena
  // comfortably covers every 2.x layout for set_default + setup.
  alignas(16) unsigned char params[16384];
  std::memset(params, 0, sizeof(params));
  g_api.set_default_decoder_parameters(params);
  if (!g_api.setup_decoder(codec, params)) {
    g_api.destroy_codec(codec);
    return -3;
  }
  void* stream = g_api.stream_default_create(/*input=*/1);
  if (!stream) {
    g_api.destroy_codec(codec);
    return -4;
  }
  MemStream ms{buf, len, 0};
  g_api.stream_set_user_data(stream, &ms, nullptr);
  g_api.stream_set_user_data_length(stream, len);
  g_api.stream_set_read_function(stream, mem_read);
  g_api.stream_set_skip_function(stream, mem_skip);
  g_api.stream_set_seek_function(stream, mem_seek);

  opj_image_t* image = nullptr;
  int rc = 0;
  if (!g_api.read_header(stream, codec, &image) || !image) {
    rc = -5;
  } else if (!g_api.decode(codec, stream, image)) {
    rc = -6;
  } else if (image->numcomps < 3 || !image->comps[0].data ||
             !image->comps[1].data || !image->comps[2].data) {
    rc = -7;
  } else {
    g_api.end_decompress(codec, stream);
    const opj_image_comp_t& c0 = image->comps[0];
    // Components can be subsampled (dx/dy > 1) in real Aperio 33003 streams;
    // index with the per-component ratios.
    const int64_t iw = c0.w, ih = c0.h;
    const int64_t cw = std::min<int64_t>(w, iw), ch = std::min<int64_t>(h, ih);
    // Per-COMPONENT precision: JPEG-2000 allows e.g. 12-bit luma with 8-bit
    // chroma; shifting every component by component 0's precision would
    // silently corrupt the lower-precision planes.
    int shift[3];
    for (int c = 0; c < 3; ++c) {
      const opj_image_comp_t& cc = image->comps[c];
      shift[c] = cc.prec > 8 ? static_cast<int>(cc.prec) - 8 : 0;
    }
    for (int64_t y = 0; y < ch; ++y) {
      uint8_t* dst = out + y * w * 3;
      for (int64_t x = 0; x < cw; ++x, dst += 3) {
        int v[3];
        for (int c = 0; c < 3; ++c) {
          const opj_image_comp_t& cc = image->comps[c];
          const int64_t sx = std::min<int64_t>(x / std::max(1u, cc.dx),
                                               cc.w - 1);
          const int64_t sy = std::min<int64_t>(y / std::max(1u, cc.dy),
                                               cc.h - 1);
          int val = cc.data[sy * cc.w + sx];
          if (cc.sgnd) val += 1 << (cc.prec - 1);
          v[c] = shift[c] ? (val >> shift[c]) : val;
        }
        if (ycbcr) {
          // Full-range JPEG YCbCr → RGB (matches OpenSlide's 33003 path).
          const int yy = v[0], cb = v[1] - 128, cr = v[2] - 128;
          dst[0] = clamp_u8(yy + ((91881 * cr) >> 16));
          dst[1] = clamp_u8(yy - ((22554 * cb + 46802 * cr) >> 16));
          dst[2] = clamp_u8(yy + ((116130 * cb) >> 16));
        } else {
          dst[0] = clamp_u8(v[0]);
          dst[1] = clamp_u8(v[1]);
          dst[2] = clamp_u8(v[2]);
        }
      }
      // zero-fill the right edge of short tiles
      if (cw < w) std::memset(out + (y * w + cw) * 3, 0, (w - cw) * 3);
    }
    for (int64_t y = ch; y < h; ++y)
      std::memset(out + y * w * 3, 0, static_cast<size_t>(w) * 3);
  }
  if (image) g_api.image_destroy(image);
  g_api.stream_destroy(stream);
  g_api.destroy_codec(codec);
  return rc;
}
