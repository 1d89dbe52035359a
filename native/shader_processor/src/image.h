// Minimal RGB8 image container + PNG IO (libpng).
//
// TPU-native replacement for the reference's stb_image-backed Texture class
// (reference: shader_processor/src/texture.cpp:25-85).  This environment has
// no GPU/GL, so images are plain CPU buffers; the effect pipeline in
// effects.cpp consumes them directly.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;  // 1 (gray) or 3 (rgb)
  std::vector<uint8_t> data;  // row-major, interleaved

  uint8_t* row(int y) { return data.data() + static_cast<size_t>(y) * width * channels; }
  const uint8_t* row(int y) const {
    return data.data() + static_cast<size_t>(y) * width * channels;
  }
  bool empty() const { return data.empty(); }
};

// Load a PNG as 8-bit gray or RGB (alpha stripped, 16-bit downsampled).
// Returns an empty image on failure.
Image load_png(const std::string& path);

// Save an RGB8 or gray8 image as PNG. Returns false on failure.
bool save_png(const std::string& path, const Image& img);

// Extension-dispatched IO, matching the reference Texture::saveImage
// png/jpg/bmp format set (reference: shader_processor/src/texture.cpp:71-85).
// load: .png or .jpg/.jpeg (libjpeg); save: .png, .jpg/.jpeg (quality 92),
// .bmp (24-bit uncompressed).  Unknown extensions fall back to PNG encoding.
Image load_image(const std::string& path);
bool save_image(const std::string& path, const Image& img);
