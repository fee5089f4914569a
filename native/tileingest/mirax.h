// MIRAX (.mrxs) backend for tileingest. See mirax.cc for the format notes.

#pragma once

#include "slide.h"

namespace tileingest {

// Opens a MIRAX slide (`path` = the .mrxs stub file; the data lives in the
// sibling directory named after the stub). Returns nullptr on any parse
// failure — the caller falls back / fails loudly, never silently.
Slide* mirax_open(const char* path);

}  // namespace tileingest
