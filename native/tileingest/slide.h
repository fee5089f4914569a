// Internal backend interface shared by the tileingest format backends
// (tileingest.cc: TIFF-container formats; mirax.cc: MIRAX .mrxs).
//
// TPU-native replacement for OpenSlide's vendor-driver layer (reference:
// utils.py:176 slide.read_region dispatches through openslide's per-format
// drivers). Each backend exposes the same pyramid metadata + a thread-safe
// level-coordinate rectangle read; the C API and the decode pool are
// backend-agnostic.

#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace tileingest {

struct Level {
  // Backend-private handle (TIFF directory index for the TIFF backend;
  // zoom-level index for MIRAX).
  int64_t dir = 0;
  int64_t width = 0;
  int64_t height = 0;
  double downsample = 1.0;
};

struct Slide {
  std::string path;
  std::vector<Level> levels;

  virtual ~Slide() = default;

  // Reads the rect (x0, y0, w, h) in LEVEL coordinates into out (RGB8,
  // w*h*3). Out-of-bounds areas are zero-filled. Returns 0 on success.
  // MUST be safe to call concurrently from multiple pool workers.
  virtual int read_rect(int level, int64_t x0, int64_t y0, int64_t w,
                        int64_t h, uint8_t* out) = 0;
};

}  // namespace tileingest
