#include "image.h"

#include <png.h>

#include <cstdio>
#include <cstring>

Image load_png(const std::string& path) {
  Image img;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return img;

  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return img;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return Image{};
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  // Normalize to 8-bit gray or RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  color_type = png_get_color_type(png, info);
  int channels = (color_type == PNG_COLOR_TYPE_GRAY) ? 1 : 3;

  img.width = static_cast<int>(w);
  img.height = static_cast<int>(h);
  img.channels = channels;
  img.data.resize(static_cast<size_t>(w) * h * channels);

  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = img.row(static_cast<int>(y));
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return img;
}

bool save_png(const std::string& path, const Image& img) {
  if (img.empty() || (img.channels != 1 && img.channels != 3)) return false;
  FILE* fp = std::fopen(path.c_str(), "wb");
  if (!fp) return false;

  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  int color = (img.channels == 1) ? PNG_COLOR_TYPE_GRAY : PNG_COLOR_TYPE_RGB;
  png_set_IHDR(png, info, img.width, img.height, 8, color, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  for (int y = 0; y < img.height; ++y)
    png_write_row(png, const_cast<png_bytep>(img.row(y)));
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return true;
}

// ---------------------------------------------------------------- jpg / bmp

#include <jpeglib.h>

#include <algorithm>
#include <cctype>

Image load_jpeg(const std::string& path) {
  Image img;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return img;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return img;
  }
  cinfo.out_color_space = cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.width = static_cast<int>(cinfo.output_width);
  img.height = static_cast<int>(cinfo.output_height);
  img.channels = cinfo.output_components == 1 ? 1 : 3;
  img.data.resize(static_cast<size_t>(img.width) * img.height * img.channels);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW r = img.row(static_cast<int>(cinfo.output_scanline));
    jpeg_read_scanlines(&cinfo, &r, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return img;
}

bool save_jpeg(const std::string& path, const Image& img, int quality = 92) {
  if (img.empty() || (img.channels != 1 && img.channels != 3)) return false;
  FILE* fp = std::fopen(path.c_str(), "wb");
  if (!fp) return false;
  jpeg_compress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, fp);
  cinfo.image_width = static_cast<JDIMENSION>(img.width);
  cinfo.image_height = static_cast<JDIMENSION>(img.height);
  cinfo.input_components = img.channels;
  cinfo.in_color_space = img.channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  for (int y = 0; y < img.height; ++y) {
    JSAMPROW r = const_cast<JSAMPROW>(img.row(y));
    jpeg_write_scanlines(&cinfo, &r, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  std::fclose(fp);
  return true;
}

// 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows, BGR order,
// 4-byte row padding) — the layout the reference's stb_image_write emits.
bool save_bmp(const std::string& path, const Image& img) {
  if (img.empty() || (img.channels != 1 && img.channels != 3)) return false;
  FILE* fp = std::fopen(path.c_str(), "wb");
  if (!fp) return false;
  const int w = img.width, h = img.height;
  const int row_bytes = (w * 3 + 3) & ~3;
  const uint32_t data_size = static_cast<uint32_t>(row_bytes) * h;
  const uint32_t file_size = 54 + data_size;

  auto put16 = [&](uint16_t v) { std::fwrite(&v, 2, 1, fp); };
  auto put32 = [&](uint32_t v) { std::fwrite(&v, 4, 1, fp); };
  std::fwrite("BM", 1, 2, fp);
  put32(file_size);
  put32(0);          // reserved
  put32(54);         // pixel data offset
  put32(40);         // BITMAPINFOHEADER size
  put32(static_cast<uint32_t>(w));
  put32(static_cast<uint32_t>(h));
  put16(1);          // planes
  put16(24);         // bpp
  put32(0);          // BI_RGB
  put32(data_size);
  put32(2835);       // 72 dpi
  put32(2835);
  put32(0);
  put32(0);

  std::vector<uint8_t> row(static_cast<size_t>(row_bytes), 0);
  for (int y = h - 1; y >= 0; --y) {  // bottom-up
    const uint8_t* src = img.row(y);
    for (int x = 0; x < w; ++x) {
      uint8_t r, g, b;
      if (img.channels == 1) r = g = b = src[x];
      else { r = src[x * 3]; g = src[x * 3 + 1]; b = src[x * 3 + 2]; }
      row[x * 3] = b; row[x * 3 + 1] = g; row[x * 3 + 2] = r;  // BGR
    }
    std::fwrite(row.data(), 1, row.size(), fp);
  }
  std::fclose(fp);
  return true;
}

static std::string lower_ext(const std::string& path) {
  size_t dot = path.find_last_of('.');
  if (dot == std::string::npos) return "";
  std::string e = path.substr(dot + 1);
  std::transform(e.begin(), e.end(), e.begin(),
                 [](unsigned char c) { return std::tolower(c); });
  return e;
}

Image load_image(const std::string& path) {
  std::string e = lower_ext(path);
  if (e == "jpg" || e == "jpeg") return load_jpeg(path);
  return load_png(path);
}

bool save_image(const std::string& path, const Image& img) {
  std::string e = lower_ext(path);
  if (e == "jpg" || e == "jpeg") return save_jpeg(path, img);
  if (e == "bmp") return save_bmp(path, img);
  return save_png(path, img);
}
