// tiledecode.cpp — threaded batch tile decoder for whole-slide images.
//
// Host-side native component of path_gene_multimodal_tpu (the TPU-native
// rebuild's analog of the libtiff/libjpeg machinery hidden inside the
// reference's tiffslide dependency). Decodes N JPEG (or deflate) tile blobs
// into one preallocated (N, H, W, 3) uint8 RGB buffer using a std::thread
// pool, so the Python tessellation stage can sustain hundreds of tiles/sec
// of decode while the TPU consumes previous batches.
//
// Exposed C ABI (see io/native.py):
//   int decode_jpeg_batch(const char** blobs, const size_t* sizes, int n,
//                         const char* tables, size_t tables_len,
//                         int tile_h, int tile_w, void* out, int threads);
//   int decode_deflate_batch(const char** blobs, const size_t* sizes, int n,
//                            int tile_h, int tile_w, void* out, int threads);
// Return 0 on success, nonzero if any tile failed.

#include <atomic>
#include <csetjmp>
#include <functional>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <zlib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG blob (optionally prefixed by shared abbreviated tables)
// into dst (tile_h * tile_w * 3, RGB). Returns true on success.
bool decode_one_jpeg(const uint8_t* data, size_t len, const uint8_t* tables,
                     size_t tables_len, int tile_h, int tile_w, uint8_t* dst) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  // Abbreviated streams (TIFF JPEGTables, tag 347): feed the tables first;
  // libjpeg keeps them for the subsequent scan-only stream.
  if (tables != nullptr && tables_len > 4) {
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(tables),
                 static_cast<unsigned long>(tables_len));
    if (jpeg_read_header(&cinfo, FALSE) != JPEG_HEADER_TABLES_ONLY) {
      // tables blob unexpectedly contained an image header; reset and
      // fall through to decoding the tile alone.
      jpeg_destroy_decompress(&cinfo);
      jpeg_create_decompress(&cinfo);
      cinfo.err = jpeg_std_error(&jerr.pub);
      jerr.pub.error_exit = jpeg_error_exit;
    }
  }
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  const int copy_w = w < tile_w ? w : tile_w;
  std::vector<uint8_t> row(static_cast<size_t>(w) * cinfo.output_components);
  uint8_t* rowp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = static_cast<int>(cinfo.output_scanline);
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    if (y < tile_h) {
      std::memcpy(dst + static_cast<size_t>(y) * tile_w * 3, rowp,
                  static_cast<size_t>(copy_w) * 3);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  // pad right/bottom with white if the encoded tile is smaller than the grid
  if (w < tile_w) {
    for (int y = 0; y < tile_h; ++y) {
      std::memset(dst + (static_cast<size_t>(y) * tile_w + w) * 3, 255,
                  static_cast<size_t>(tile_w - w) * 3);
    }
  }
  if (h < tile_h) {
    std::memset(dst + static_cast<size_t>(h) * tile_w * 3, 255,
                static_cast<size_t>(tile_h - h) * tile_w * 3);
  }
  return true;
}

bool decode_one_deflate(const uint8_t* data, size_t len, int tile_h,
                        int tile_w, uint8_t* dst) {
  uLongf out_len = static_cast<uLongf>(tile_h) * tile_w * 3;
  const int rc = uncompress(dst, &out_len, data, static_cast<uLong>(len));
  if (rc != Z_OK && rc != Z_BUF_ERROR) return false;
  if (out_len < static_cast<uLongf>(tile_h) * tile_w * 3) {
    std::memset(dst + out_len, 255,
                static_cast<size_t>(tile_h) * tile_w * 3 - out_len);
  }
  return true;
}

int run_pool(int n, int threads, const std::function<bool(int)>& work) {
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 4;
  }
  if (threads > n) threads = n > 0 ? n : 1;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        const int i = next.fetch_add(1);
        if (i >= n) break;
        if (!work(i)) failures.fetch_add(1);
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // namespace

extern "C" {

int decode_jpeg_batch(const char** blobs, const size_t* sizes, int n,
                      const char* tables, size_t tables_len, int tile_h,
                      int tile_w, void* out, int threads) {
  uint8_t* dst0 = static_cast<uint8_t*>(out);
  const size_t tile_bytes = static_cast<size_t>(tile_h) * tile_w * 3;
  const uint8_t* tbl = reinterpret_cast<const uint8_t*>(tables);
  return run_pool(n, threads, [&](int i) {
    return decode_one_jpeg(reinterpret_cast<const uint8_t*>(blobs[i]),
                           sizes[i], tbl, tables_len, tile_h, tile_w,
                           dst0 + tile_bytes * i);
  });
}

int decode_deflate_batch(const char** blobs, const size_t* sizes, int n,
                         int tile_h, int tile_w, void* out, int threads) {
  uint8_t* dst0 = static_cast<uint8_t*>(out);
  const size_t tile_bytes = static_cast<size_t>(tile_h) * tile_w * 3;
  return run_pool(n, threads, [&](int i) {
    return decode_one_deflate(reinterpret_cast<const uint8_t*>(blobs[i]),
                              sizes[i], tile_h, tile_w, dst0 + tile_bytes * i);
  });
}

}  // extern "C"
