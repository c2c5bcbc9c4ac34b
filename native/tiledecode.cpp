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
//   int decode_jpeg_batch_opts(...same..., int fancy);   // fancy=0: nearest
//                         // chroma upsample (libjpeg merged path) — the
//                         // host-side oracle for the planar device feed
//   int decode_jpeg_batch_planar(const char** blobs, const size_t* sizes,
//                         int n, const char* tables, size_t tables_len,
//                         int tile_h, int tile_w, void* out_y, void* out_cbcr,
//                         unsigned char* ok /*nullable per-tile flags*/,
//                         int threads);  // raw 4:2:0 planes, no upsample —
//                         // HALF the bytes of RGB; chroma upsample + color
//                         // conversion happen on-device (ops/jpegcolor.py)
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

// Create a decompressor, feed optional abbreviated tables + the tile blob,
// and read the header. Returns false on any libjpeg error (caller must have
// installed the setjmp handler on jerr BEFORE calling).
bool open_jpeg(jpeg_decompress_struct* cinfo, JpegErrorMgr* jerr,
               const uint8_t* data, size_t len, const uint8_t* tables,
               size_t tables_len) {
  jpeg_create_decompress(cinfo);
  // Abbreviated streams (TIFF JPEGTables, tag 347): feed the tables first;
  // libjpeg keeps them for the subsequent scan-only stream.
  if (tables != nullptr && tables_len > 4) {
    jpeg_mem_src(cinfo, const_cast<uint8_t*>(tables),
                 static_cast<unsigned long>(tables_len));
    if (jpeg_read_header(cinfo, FALSE) != JPEG_HEADER_TABLES_ONLY) {
      // tables blob unexpectedly contained an image header; reset and
      // fall through to decoding the tile alone.
      jpeg_destroy_decompress(cinfo);
      jpeg_create_decompress(cinfo);
      cinfo->err = jpeg_std_error(&jerr->pub);
      jerr->pub.error_exit = jpeg_error_exit;
    }
  }
  jpeg_mem_src(cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(cinfo);
    return false;
  }
  return true;
}

// Decode one JPEG blob (optionally prefixed by shared abbreviated tables)
// into dst (tile_h * tile_w * 3, RGB). Returns true on success.
bool decode_one_jpeg(const uint8_t* data, size_t len, const uint8_t* tables,
                     size_t tables_len, int tile_h, int tile_w, uint8_t* dst,
                     int fancy = 1) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  // declared BEFORE setjmp so its destructor still runs when error_exit
  // longjmps back here (objects constructed after setjmp would leak)
  std::vector<uint8_t> row;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  if (!open_jpeg(&cinfo, &jerr, data, len, tables, tables_len)) return false;
  // Contract (io/tiff.py): blobs are TIFF tiles decoded at the page's
  // declared tile size, so headers claiming far larger dims are corrupt.
  // Keep modest crop tolerance (≤2× per side) but fail anything beyond —
  // otherwise a hostile/corrupt header drives unbounded scanline work.
  if (cinfo.image_width > 2u * static_cast<unsigned>(tile_w) + 32u ||
      cinfo.image_height > 2u * static_cast<unsigned>(tile_h) + 32u) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.do_fancy_upsampling = fancy ? TRUE : FALSE;
  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  const int copy_w = w < tile_w ? w : tile_w;
  row.resize(static_cast<size_t>(w) * cinfo.output_components);
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

// Decode one 4:2:0 YCbCr JPEG into raw planes WITHOUT chroma upsampling or
// color conversion: dst_y is (tile_h, tile_w) luma, dst_cbcr is
// (ceil(tile_h/2), ceil(tile_w/2), 2) interleaved Cb,Cr. Exactly half the
// bytes of the RGB output — the host→device transfer format of the planar
// tile feed. Fails (→ caller falls back to RGB) for any sampling layout
// other than plain 4:2:0 YCbCr.
bool decode_one_jpeg_planar(const uint8_t* data, size_t len,
                            const uint8_t* tables, size_t tables_len,
                            int tile_h, int tile_w, uint8_t* dst_y,
                            uint8_t* dst_cbcr) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  // declared BEFORE setjmp so their destructors still run when error_exit
  // longjmps back (vectors constructed after setjmp would leak ~1.5x the
  // tile bytes per failed/corrupt blob)
  std::vector<uint8_t> ybuf, cbbuf, crbuf;
  std::vector<JSAMPROW> yrows, cbrows, crrows;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  if (!open_jpeg(&cinfo, &jerr, data, len, tables, tables_len)) return false;
  if (cinfo.num_components != 3 || cinfo.jpeg_color_space != JCS_YCbCr ||
      cinfo.comp_info[0].h_samp_factor != 2 ||
      cinfo.comp_info[0].v_samp_factor != 2 ||
      cinfo.comp_info[1].h_samp_factor != 1 ||
      cinfo.comp_info[1].v_samp_factor != 1 ||
      cinfo.comp_info[2].h_samp_factor != 1 ||
      cinfo.comp_info[2].v_samp_factor != 1 ||
      // odd encoded dims: the chroma sample straddling the content/pad
      // boundary is real, so the first pad column/row would reconstruct
      // tinted instead of white and break bit-parity with the RGB path —
      // such (rare, undersized-edge) tiles fall back to RGB decode
      (cinfo.image_width % 2) != 0 || (cinfo.image_height % 2) != 0 ||
      // corrupt headers claiming huge dims would size the raw-plane
      // scratch below from those dims (multi-GB, bad_alloc): bound them
      // by the same ≤2×-tile crop tolerance as the RGB path
      cinfo.image_width > 2u * static_cast<unsigned>(tile_w) + 32u ||
      cinfo.image_height > 2u * static_cast<unsigned>(tile_h) + 32u) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.raw_data_out = TRUE;
  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  // libjpeg writes whole iMCU rows (16 luma / 8 chroma lines) with rows
  // padded to full DCT blocks — decode into padded scratch, then crop.
  const int n_mcu_rows = static_cast<int>(cinfo.total_iMCU_rows);
  const int y_stride =
      static_cast<int>(cinfo.comp_info[0].width_in_blocks) * DCTSIZE;
  const int c_stride =
      static_cast<int>(cinfo.comp_info[1].width_in_blocks) * DCTSIZE;
  ybuf.resize(static_cast<size_t>(n_mcu_rows) * 16 * y_stride);
  cbbuf.resize(static_cast<size_t>(n_mcu_rows) * 8 * c_stride);
  crbuf.resize(static_cast<size_t>(n_mcu_rows) * 8 * c_stride);
  yrows.resize(static_cast<size_t>(n_mcu_rows) * 16);
  cbrows.resize(static_cast<size_t>(n_mcu_rows) * 8);
  crrows.resize(static_cast<size_t>(n_mcu_rows) * 8);
  for (size_t r = 0; r < yrows.size(); ++r) yrows[r] = &ybuf[r * y_stride];
  for (size_t r = 0; r < cbrows.size(); ++r) {
    cbrows[r] = &cbbuf[r * c_stride];
    crrows[r] = &crbuf[r * c_stride];
  }
  size_t read_y = 0, read_c = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPARRAY planes[3] = {yrows.data() + read_y, cbrows.data() + read_c,
                            crrows.data() + read_c};
    const JDIMENSION got = jpeg_read_raw_data(&cinfo, planes, 16);
    if (got == 0) break;
    read_y += got;
    read_c += got / 2;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  // crop/copy into the output planes; pad with WHITE (Y=255, Cb=Cr=128) to
  // match the RGB path's white padding for undersized edge tiles
  const int copy_w = w < tile_w ? w : tile_w;
  const int copy_h = h < tile_h ? h : tile_h;
  for (int y = 0; y < tile_h; ++y) {
    uint8_t* row = dst_y + static_cast<size_t>(y) * tile_w;
    if (y < copy_h) {
      std::memcpy(row, &ybuf[static_cast<size_t>(y) * y_stride], copy_w);
      if (copy_w < tile_w) std::memset(row + copy_w, 255, tile_w - copy_w);
    } else {
      std::memset(row, 255, tile_w);
    }
  }
  const int cw_out = (tile_w + 1) / 2, ch_out = (tile_h + 1) / 2;
  const int cw_in = (w + 1) / 2, ch_in = (h + 1) / 2;
  const int ccopy_w = cw_in < cw_out ? cw_in : cw_out;
  const int ccopy_h = ch_in < ch_out ? ch_in : ch_out;
  for (int y = 0; y < ch_out; ++y) {
    uint8_t* row = dst_cbcr + static_cast<size_t>(y) * cw_out * 2;
    if (y < ccopy_h) {
      const uint8_t* cb = &cbbuf[static_cast<size_t>(y) * c_stride];
      const uint8_t* cr = &crbuf[static_cast<size_t>(y) * c_stride];
      for (int x = 0; x < ccopy_w; ++x) {
        row[2 * x] = cb[x];
        row[2 * x + 1] = cr[x];
      }
      for (int x = ccopy_w; x < cw_out; ++x) {
        row[2 * x] = 128;
        row[2 * x + 1] = 128;
      }
    } else {
      std::memset(row, 128, static_cast<size_t>(cw_out) * 2);
    }
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
        // an exception escaping a std::thread calls std::terminate and
        // takes the whole interpreter down — contain per-tile failures
        // (bad_alloc on corrupt dims, etc.) to a failure count instead
        bool good = false;
        try {
          good = work(i);
        } catch (...) {
          good = false;
        }
        if (!good) failures.fetch_add(1);
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // namespace

extern "C" {

int decode_jpeg_batch_opts(const char** blobs, const size_t* sizes, int n,
                           const char* tables, size_t tables_len, int tile_h,
                           int tile_w, void* out, int threads, int fancy) {
  uint8_t* dst0 = static_cast<uint8_t*>(out);
  const size_t tile_bytes = static_cast<size_t>(tile_h) * tile_w * 3;
  const uint8_t* tbl = reinterpret_cast<const uint8_t*>(tables);
  return run_pool(n, threads, [&](int i) {
    return decode_one_jpeg(reinterpret_cast<const uint8_t*>(blobs[i]),
                           sizes[i], tbl, tables_len, tile_h, tile_w,
                           dst0 + tile_bytes * i, fancy);
  });
}

int decode_jpeg_batch(const char** blobs, const size_t* sizes, int n,
                      const char* tables, size_t tables_len, int tile_h,
                      int tile_w, void* out, int threads) {
  return decode_jpeg_batch_opts(blobs, sizes, n, tables, tables_len, tile_h,
                                tile_w, out, threads, /*fancy=*/1);
}

// `ok` (optional, may be NULL): per-tile success flags, so a batch with ONE
// non-4:2:0/odd tile still hands the caller every successfully decoded
// plane pair instead of discarding the whole batch.
int decode_jpeg_batch_planar(const char** blobs, const size_t* sizes, int n,
                             const char* tables, size_t tables_len, int tile_h,
                             int tile_w, void* out_y, void* out_cbcr,
                             unsigned char* ok, int threads) {
  uint8_t* y0 = static_cast<uint8_t*>(out_y);
  uint8_t* c0 = static_cast<uint8_t*>(out_cbcr);
  const size_t y_bytes = static_cast<size_t>(tile_h) * tile_w;
  const size_t c_bytes =
      static_cast<size_t>((tile_h + 1) / 2) * ((tile_w + 1) / 2) * 2;
  const uint8_t* tbl = reinterpret_cast<const uint8_t*>(tables);
  return run_pool(n, threads, [&](int i) {
    const bool good = decode_one_jpeg_planar(
        reinterpret_cast<const uint8_t*>(blobs[i]), sizes[i], tbl, tables_len,
        tile_h, tile_w, y0 + y_bytes * i, c0 + c_bytes * i);
    if (ok != nullptr) ok[i] = good ? 1 : 0;
    return good;
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
