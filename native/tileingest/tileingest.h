// tileingest — native tile-ingest service for the TPU WSI framework.
//
// TPU-native replacement for the reference's OpenSlide hot path
// (reference: utils.py:176 slide.read_region inside DataLoader workers).
// A pyramidal tiled-TIFF/SVS reader (libtiff + libjpeg-turbo) plus a
// multi-threaded batch extraction pool that decodes, crops, and bilinearly
// resizes tiles straight into caller-owned (numpy) buffers, overlapping
// host I/O with device steps.
//
// C API (ctypes-friendly): every function returns 0 on success, negative on
// error unless documented otherwise.

#pragma once

#include <cstdint>

extern "C" {

// ---- slide handles ----------------------------------------------------------
// Opens a (tiled or scanline) TIFF/SVS pyramid. Returns a handle id >= 0.
int ti_open(const char* path);
void ti_close(int slide);

// Number of pyramid levels.
int ti_levels(int slide);
// Level dimensions; returns 0 on success.
int ti_level_dims(int slide, int level, int64_t* width, int64_t* height);
// Downsample factor of a level relative to level 0.
double ti_level_downsample(int slide, int level);

// Reads a region at `level`. (x, y) are LEVEL-0 coordinates (OpenSlide
// convention); (w, h) are the region size at the requested level. Output is
// packed RGB8 into out (w*h*3 bytes). Out-of-bounds areas are zero-filled.
int ti_read_region(int slide, int level, int64_t x, int64_t y,
                   int64_t w, int64_t h, uint8_t* out);

// ---- batch pool --------------------------------------------------------------
// Starts the worker pool (idempotent; n_threads <= 0 → hardware concurrency).
int ti_pool_start(int n_threads);
void ti_pool_stop();

// One tile request: read (adjusted x adjusted) at `level` from (x, y)
// [level-0 coords], bilinear-resize to (out_size x out_size), write RGB8 at
// out + index*out_size*out_size*3.
struct TiRequest {
  int32_t slide;
  int32_t level;
  int64_t x;
  int64_t y;
  int32_t adjusted_size;
  int32_t out_size;
  int64_t index;
};

// Submits a batch and blocks until done. Returns number of failed tiles
// (failed tiles are zero-filled — the reference's blank-patch fallback,
// utils.py:175-181 — but counted here).
int ti_extract_batch(const TiRequest* reqs, int n, uint8_t* out);

// ---- synthetic fixtures -------------------------------------------------------
// Writes a tiled pyramidal RGB TIFF with `levels` levels (factor-2) and a
// deterministic procedural pattern, for tests/benchmarks.
int ti_write_synthetic(const char* path, int64_t width, int64_t height,
                       int levels, int tile, uint32_t seed);

// Same pattern but with a realistic Aperio SVS directory layout: base,
// STRIP thumbnail at dir 1, tiled reduced levels without SUBFILETYPE,
// then strip label/macro pages (wrong aspect ratio). For level-detection
// tests.
int ti_write_synthetic_svs(const char* path, int64_t width, int64_t height,
                           int levels, int tile, uint32_t seed);

// Same deterministic pattern as a MIRAX slide: `path` must end in .mrxs;
// writes the stub file plus the sibling data directory (Slidedat.ini,
// Index.dat, Data0000.dat with JPEG tiles and a camera-position buffer
// with overlaps). `tile` is the per-division tile size. For .mrxs reader
// tests (mirax.cc).
int ti_write_synthetic_mrxs(const char* path, int64_t width, int64_t height,
                            int levels, int tile, uint32_t seed);

// ---- offline transcode --------------------------------------------------------
// Transcodes any supported slide (MIRAX/SVS/NDPI/TIFF) into a tiled
// pyramidal JPEG TIFF (BigTIFF) at `dst`, copying every source pyramid
// level. MIRAX mosaics decode ~3.5x slower per core than tiled TIFF
// (BENCH.md), so CARMEL-class .mrxs cohorts are transcoded ONCE offline and
// then ingest at the TIFF rate (reference equivalent: OpenSlide serves
// .mrxs directly on every epoch, utils.py:176 — we pay the mosaic cost one
// time instead). `tile` must be a multiple of 16 (JPEG MCU); quality in
// [1, 100]; n_threads <= 0 → hardware concurrency. Stripes of output tiles
// are decoded in parallel and written in order. Returns 0 on success.
int ti_transcode(const char* src, const char* dst, int tile, int quality,
                 int n_threads);

// Version/health probe.
int ti_abi_version();

}  // extern "C"
