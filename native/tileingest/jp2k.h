// jp2k — minimal JPEG-2000 tile decoder for Aperio SVS (compression tags
// 33003 "YCbCr wavelet" / 33005 "RGB wavelet"), backed by the system
// libopenjp2 loaded at runtime via dlopen (no build-time dependency: this
// image ships the .so but not the headers).
//
// Reference parity: OpenSlide decodes these tags for .svs slides
// (reference: utils.py:176 _load_image via openslide); the tpuwsi native
// reader covers them so JP2K-compressed cohorts take the threaded C++ path
// instead of falling back to Python.

#pragma once

#include <cstddef>
#include <cstdint>

// Whether a JP2K decoder is available (libopenjp2 found & resolved).
bool jp2k_available();

// Decodes one raw JPEG-2000 codestream (J2K or JP2 container, sniffed from
// the magic) into packed top-down RGB8. `w`/`h` give the expected tile size;
// decoded images smaller than (w, h) fill the top-left corner (edge tiles),
// larger ones are cropped. If `ycbcr` is true the decoded components are
// interpreted as full-range YCbCr and converted to RGB (Aperio 33003 —
// codestreams without a signalled MCT). Returns 0 on success.
int jp2k_decode(const uint8_t* buf, size_t len, uint8_t* out, int64_t w,
                int64_t h, bool ycbcr);
