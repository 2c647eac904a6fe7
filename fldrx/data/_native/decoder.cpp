// fldrx native data loader — multithreaded PNG decode to BGR uint8.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (utils.py:127-128): PNG decode is the host-side bottleneck of
// 4K evaluation (SURVEY.md §3.1), so it runs here in C++ on a thread pool
// with no GIL involvement; Python sees filled numpy buffers via ctypes.
//
// Exports (C ABI):
//   fldrx_png_probe(path, &w, &h)            -> 0 on success
//   fldrx_png_decode(path, out, w, h)        -> 0 on success (BGR, row-major)
//   fldrx_png_decode_batch(paths, n, outs, w, h, threads) -> #failures
//
// Build: g++ -O3 -shared -fPIC decoder.cpp -lpng -o libfldrx_decoder.so

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct PngImage {
    std::vector<png_bytep> rows;
    uint32_t width = 0, height = 0;
};

// Decode one PNG into caller-provided BGR buffer (w*h*3). Returns 0 on ok.
int decode_one(const char* path, uint8_t* out, uint32_t expect_w,
               uint32_t expect_h) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return 1;

    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) { fclose(fp); return 2; }
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return 2; }

    std::vector<uint8_t> rowbuf;
    std::vector<png_bytep> rows;

    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return 3;
    }

    png_init_io(png, fp);
    png_read_info(png, info);

    uint32_t w = png_get_image_width(png, info);
    uint32_t h = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);

    if (w != expect_w || h != expect_h) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return 4;
    }

    // normalize to 8-bit RGB
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_set_bgr(png);                       // emit BGR directly (cv2 parity)
    png_read_update_info(png, info);

    size_t stride = png_get_rowbytes(png, info);
    if (stride != static_cast<size_t>(w) * 3) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return 5;
    }
    rows.resize(h);
    for (uint32_t y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * stride;
    png_read_image(png, rows.data());
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
}

}  // namespace

extern "C" {

int fldrx_png_probe(const char* path, uint32_t* w, uint32_t* h) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (!png || !info) { if (png) png_destroy_read_struct(&png, &info, nullptr); fclose(fp); return 2; }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return 3;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
}

int fldrx_png_decode(const char* path, uint8_t* out, uint32_t w, uint32_t h) {
    return decode_one(path, out, w, h);
}

// Decode n images of identical size in parallel; outs[i] must hold w*h*3.
// Returns the number of failed decodes.
int fldrx_png_decode_batch(const char** paths, int n, uint8_t** outs,
                           uint32_t w, uint32_t h, int threads) {
    if (threads < 1) threads = 1;
    std::atomic<int> next(0), failures(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            if (decode_one(paths[i], outs[i], w, h) != 0) failures.fetch_add(1);
        }
    };
    std::vector<std::thread> pool;
    int nt = threads < n ? threads : n;
    pool.reserve(nt);
    for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failures.load();
}

}  // extern "C"
