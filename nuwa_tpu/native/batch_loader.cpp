// Native batch assembly for uint8 memmap datasets.
//
// The reference's data path is Python/PIL per-sample (train_vqgan_vae.py:49-114,
// train_nuwa.py:84-147). This library does the hot inner loop natively:
// gather N samples by index from a uint8 memmap, convert to float32 in
// [0, 1], optionally rotate by k*90 degrees, and write into a caller-owned
// contiguous batch buffer. Exposed via ctypes (no pybind11 in this image).
//
// Build: see nuwa_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather + normalize: src is (num_items, item_elems) uint8; out is
// (batch, item_elems) float32. indices has batch entries.
void gather_normalize_f32(const uint8_t* src, const int64_t* indices,
                          int64_t batch, int64_t item_elems, float scale,
                          float* out, int num_threads) {
    auto work = [&](int64_t b0, int64_t b1) {
        for (int64_t b = b0; b < b1; ++b) {
            const uint8_t* s = src + indices[b] * item_elems;
            float* d = out + b * item_elems;
            for (int64_t i = 0; i < item_elems; ++i) {
                d[i] = static_cast<float>(s[i]) * scale;
            }
        }
    };
    if (num_threads <= 1 || batch < 4) {
        work(0, batch);
        return;
    }
    std::vector<std::thread> threads;
    int64_t per = (batch + num_threads - 1) / num_threads;
    for (int t = 0; t < num_threads; ++t) {
        int64_t b0 = t * per;
        int64_t b1 = b0 + per > batch ? batch : b0 + per;
        if (b0 >= b1) break;
        threads.emplace_back(work, b0, b1);
    }
    for (auto& th : threads) th.join();
}

// Rotate an HW-plane image stack (c, h, w) float32 by k*90 degrees
// counter-clockwise into out (c, h', w').
void rot90_f32(const float* src, int64_t c, int64_t h, int64_t w, int k,
               float* out) {
    k = ((k % 4) + 4) % 4;
    for (int64_t ch = 0; ch < c; ++ch) {
        const float* s = src + ch * h * w;
        if (k == 0) {
            std::memcpy(out + ch * h * w, s, sizeof(float) * h * w);
        } else if (k == 1) {  // (i, j) -> (w-1-j, i)
            float* d = out + ch * w * h;
            for (int64_t i = 0; i < h; ++i)
                for (int64_t j = 0; j < w; ++j)
                    d[(w - 1 - j) * h + i] = s[i * w + j];
        } else if (k == 2) {
            float* d = out + ch * h * w;
            for (int64_t i = 0; i < h; ++i)
                for (int64_t j = 0; j < w; ++j)
                    d[(h - 1 - i) * w + (w - 1 - j)] = s[i * w + j];
        } else {  // k == 3: (i, j) -> (j, h-1-i)
            float* d = out + ch * w * h;
            for (int64_t i = 0; i < h; ++i)
                for (int64_t j = 0; j < w; ++j)
                    d[j * h + (h - 1 - i)] = s[i * w + j];
        }
    }
}

// Gather int64 token rows (for pre-tokenized index datasets).
void gather_i64(const int64_t* src, const int64_t* indices, int64_t batch,
                int64_t item_elems, int64_t* out) {
    for (int64_t b = 0; b < batch; ++b) {
        std::memcpy(out + b * item_elems, src + indices[b] * item_elems,
                    sizeof(int64_t) * item_elems);
    }
}

}  // extern "C"
