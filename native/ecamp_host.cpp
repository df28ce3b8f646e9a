// ecamp_host — native host-side feeder kernels for ecamp_tpu.
//
// TPU-native replacement for the reference's native input-path dependencies
// (HF `tokenizers` Rust wheel for WordPiece, opencv/PIL-SIMD for image
// resize — SURVEY §2.10). Exposed via a C ABI and loaded with ctypes; every
// entry point releases the GIL implicitly (plain C calls), so the Python
// thread-pool loader gets real parallelism.
//
// Scope: ASCII fast path for tokenization (MIMIC reports are ASCII); any
// string with non-ASCII bytes returns -1 and the caller falls back to the
// Python implementation (exact-parity path). Image ops are bilinear
// crop-resize + normalize, matching PIL semantics.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WordPiece tokenizer

struct Tokenizer {
    std::unordered_map<std::string, int32_t> vocab;
    std::vector<std::string> specials;  // matched pre-normalization
    std::vector<int32_t> special_ids;
    int32_t unk_id = 1;
    int32_t pad_id = 0;
    int32_t max_chars = 100;
};

Tokenizer* ecamp_tok_new(const char** tokens, const int32_t* ids, int64_t n,
                         const char** specials, const int32_t* special_ids,
                         int64_t n_special, int32_t unk_id, int32_t pad_id,
                         int32_t max_chars) {
    auto* t = new Tokenizer();
    t->vocab.reserve(static_cast<size_t>(n) * 2);
    for (int64_t i = 0; i < n; ++i) t->vocab.emplace(tokens[i], ids[i]);
    for (int64_t i = 0; i < n_special; ++i) {
        t->specials.emplace_back(specials[i]);
        t->special_ids.push_back(special_ids[i]);
    }
    t->unk_id = unk_id;
    t->pad_id = pad_id;
    t->max_chars = max_chars;
    return t;
}

void ecamp_tok_free(Tokenizer* t) { delete t; }

namespace {

inline bool is_word_char(unsigned char c) {
    // ASCII subset of python's \w (re.UNICODE): [a-zA-Z0-9_]
    return std::isalnum(c) || c == '_';
}

inline bool is_space_char(unsigned char c) { return std::isspace(c); }

// WordPiece greedy longest-match on one word. Returns false on UNK.
bool wordpiece(const Tokenizer& t, const std::string& word,
               std::vector<int32_t>& out) {
    if (static_cast<int32_t>(word.size()) > t.max_chars) return false;
    size_t start = 0;
    std::string probe;
    size_t emitted = out.size();
    while (start < word.size()) {
        size_t end = word.size();
        int32_t cur = -1;
        while (start < end) {
            probe.clear();
            if (start > 0) probe = "##";
            probe.append(word, start, end - start);
            auto it = t.vocab.find(probe);
            if (it != t.vocab.end()) { cur = it->second; break; }
            --end;
        }
        if (cur < 0) { out.resize(emitted); return false; }
        out.push_back(cur);
        start = end;
    }
    return true;
}

// normalize (ASCII lowercase) + whitespace/punct/digit pretokenize + WP.
void encode_segment(const Tokenizer& t, const char* s, int64_t len,
                    std::vector<int32_t>& out) {
    std::string word;
    int64_t i = 0;
    auto flush_word = [&](const std::string& w) {
        if (w.empty()) return;
        // Digits pretokenizer: split digit runs from non-digit runs
        size_t p = 0;
        while (p < w.size()) {
            size_t q = p;
            bool dig = std::isdigit(static_cast<unsigned char>(w[p]));
            while (q < w.size() &&
                   (std::isdigit(static_cast<unsigned char>(w[q])) != 0) == dig)
                ++q;
            std::string piece = w.substr(p, q - p);
            if (!wordpiece(t, piece, out)) out.push_back(t.unk_id);
            p = q;
        }
    };
    while (i < len) {
        unsigned char c = static_cast<unsigned char>(s[i]);
        if (is_space_char(c)) { flush_word(word); word.clear(); ++i; continue; }
        if (is_word_char(c)) {
            word.push_back(static_cast<char>(std::tolower(c)));
            ++i;
            continue;
        }
        // punctuation run [^\w\s]+
        flush_word(word); word.clear();
        std::string punct;
        while (i < len) {
            unsigned char pc = static_cast<unsigned char>(s[i]);
            if (is_space_char(pc) || is_word_char(pc)) break;
            punct.push_back(s[i]);
            ++i;
        }
        if (!wordpiece(t, punct, out)) out.push_back(t.unk_id);
    }
    flush_word(word);
}

}  // namespace

// Encode one text. Returns number of real tokens written (<= pad_to), or -1
// if the text contains non-ASCII bytes (caller must fall back to Python).
int64_t ecamp_tok_encode(const Tokenizer* t, const char* text, int64_t len,
                         int32_t max_len, int32_t pad_to, int32_t* out_ids,
                         int32_t* out_attn) {
    for (int64_t i = 0; i < len; ++i)
        if (static_cast<unsigned char>(text[i]) >= 0x80) return -1;

    std::vector<int32_t> ids;
    ids.reserve(max_len);
    // special-token splitting (pre-normalization)
    int64_t pos = 0;
    while (pos < len) {
        int64_t next = len;
        int64_t which = -1;
        for (size_t k = 0; k < t->specials.size(); ++k) {
            const char* found = static_cast<const char*>(memmem(
                text + pos, static_cast<size_t>(len - pos),
                t->specials[k].data(), t->specials[k].size()));
            if (found) {
                int64_t at = found - text;
                if (at < next) { next = at; which = static_cast<int64_t>(k); }
            }
        }
        if (next > pos) encode_segment(*t, text + pos, next - pos, ids);
        if (which >= 0) {
            ids.push_back(t->special_ids[static_cast<size_t>(which)]);
            pos = next + static_cast<int64_t>(t->specials[
                static_cast<size_t>(which)].size());
        } else {
            pos = next;
        }
    }
    int64_t n = std::min<int64_t>(static_cast<int64_t>(ids.size()), max_len);
    for (int64_t i = 0; i < pad_to; ++i) {
        out_ids[i] = i < n ? ids[static_cast<size_t>(i)] : t->pad_id;
        out_attn[i] = i < n ? 1 : 0;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Image ops: PIL-semantics bilinear crop-resize (u8 HWC -> f32 HWC) with
// grayscale replicate + normalize fused. PIL's BILINEAR is an antialiased
// separable triangle-filter resample (support scales with the downscale
// factor) — reproduced here so the native path matches the Python/PIL path.

namespace {

struct FilterTaps {
    std::vector<int32_t> bounds;   // (xmin, size) per output pixel
    std::vector<float> weights;    // ksize per output pixel
    int32_t ksize = 0;
};

inline double triangle(double x) {
    x = std::abs(x);
    return x < 1.0 ? 1.0 - x : 0.0;
}

inline double bicubic(double x) {
    // PIL's cubic kernel, a = -0.5
    constexpr double a = -0.5;
    x = std::abs(x);
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

FilterTaps compute_taps(int64_t in_size, int64_t out_size, double box0,
                        double box1, int32_t filter) {
    FilterTaps taps;
    const double base_support = filter == 1 ? 2.0 : 1.0;
    auto kernel = filter == 1 ? bicubic : triangle;
    const double scale = (box1 - box0) / static_cast<double>(out_size);
    const double filterscale = std::max(scale, 1.0);
    const double support = base_support * filterscale;
    taps.ksize = static_cast<int32_t>(std::ceil(support)) * 2 + 1;
    taps.bounds.resize(static_cast<size_t>(out_size) * 2);
    taps.weights.assign(static_cast<size_t>(out_size) * taps.ksize, 0.0);
    for (int64_t x = 0; x < out_size; ++x) {
        double center = box0 + (x + 0.5) * scale;
        int64_t xmin = static_cast<int64_t>(center - support + 0.5);
        xmin = std::max<int64_t>(xmin, 0);
        int64_t xmax = static_cast<int64_t>(center + support + 0.5);
        xmax = std::min<int64_t>(xmax, in_size) - xmin;
        float* w = &taps.weights[static_cast<size_t>(x) * taps.ksize];
        double total = 0.0;
        for (int64_t j = 0; j < xmax; ++j) {
            double val = kernel((j + xmin - center + 0.5) / filterscale);
            w[j] = val;
            total += val;
        }
        if (total != 0.0)
            for (int64_t j = 0; j < xmax; ++j) w[j] /= total;
        taps.bounds[static_cast<size_t>(x) * 2] = static_cast<int32_t>(xmin);
        taps.bounds[static_cast<size_t>(x) * 2 + 1] = static_cast<int32_t>(xmax);
    }
    return taps;
}

}  // namespace

void ecamp_resize_gray_u8(const uint8_t* src, int64_t sh, int64_t sw,
                          int64_t channels,
                          double box_x0, double box_y0, double box_x1,
                          double box_y1, int64_t oh, int64_t ow,
                          int32_t filter, uint8_t* dst);

void ecamp_resize_norm(const uint8_t* src, int64_t sh, int64_t sw,
                       int64_t channels,
                       double box_x0, double box_y0, double box_x1,
                       double box_y1, int64_t oh, int64_t ow,
                       float mean, float std_, int32_t grayscale,
                       int32_t filter, float* dst) {
    const float inv_std = 1.0f / std_;
    const int64_t c_in = channels;
    if (grayscale || c_in == 1) {
        // same quantized gray as the fused path computed inline before;
        // delegating keeps one copy of the two-pass resample core
        std::vector<uint8_t> gray(static_cast<size_t>(oh) * ow);
        ecamp_resize_gray_u8(src, sh, sw, c_in, box_x0, box_y0, box_x1,
                             box_y1, oh, ow, filter, gray.data());
        for (int64_t i = 0; i < oh * ow; ++i) {
            float v = (static_cast<float>(gray[i]) / 255.0f - mean)
                      * inv_std;
            dst[i * 3] = dst[i * 3 + 1] = dst[i * 3 + 2] = v;
        }
        return;
    }
    const FilterTaps hx = compute_taps(sw, ow, box_x0, box_x1, filter);
    const FilterTaps vy = compute_taps(sh, oh, box_y0, box_y1, filter);

    // horizontal pass over only the source rows the vertical pass reads
    int64_t ymin_all = sh, ymax_all = 0;
    for (int64_t y = 0; y < oh; ++y) {
        ymin_all = std::min<int64_t>(ymin_all, vy.bounds[y * 2]);
        ymax_all = std::max<int64_t>(ymax_all,
                                     vy.bounds[y * 2] + vy.bounds[y * 2 + 1]);
    }
    std::vector<float> temp(static_cast<size_t>(ymax_all - ymin_all) * ow * c_in);
    for (int64_t y = ymin_all; y < ymax_all; ++y) {
        const uint8_t* row = src + y * sw * c_in;
        float* trow = temp.data() + (y - ymin_all) * ow * c_in;
        for (int64_t x = 0; x < ow; ++x) {
            int32_t xmin = hx.bounds[x * 2];
            int32_t xsz = hx.bounds[x * 2 + 1];
            const float* w = &hx.weights[static_cast<size_t>(x) * hx.ksize];
            for (int64_t c = 0; c < c_in; ++c) {
                float acc = 0.0f;
                for (int32_t j = 0; j < xsz; ++j)
                    acc += row[(xmin + j) * c_in + c] * w[j];
                // PIL's 8bpc resample rounds+clips the horizontal pass to
                // u8 before the vertical pass (clip8 in Resample.c); match
                // it so bicubic overshoot clips identically between passes
                trow[x * c_in + c] = static_cast<float>(
                    static_cast<uint8_t>(std::clamp(acc + 0.5f, 0.0f,
                                                    255.0f)));
            }
        }
    }
    // vertical pass + fused grayscale/normalize
    for (int64_t y = 0; y < oh; ++y) {
        int32_t ymin = vy.bounds[y * 2];
        int32_t ysz = vy.bounds[y * 2 + 1];
        const float* w = &vy.weights[static_cast<size_t>(y) * vy.ksize];
        for (int64_t x = 0; x < ow; ++x) {
            float px[4] = {0, 0, 0, 0};
            for (int32_t j = 0; j < ysz; ++j) {
                const float* trow = temp.data() +
                    (ymin + j - ymin_all) * ow * c_in;
                for (int64_t c = 0; c < c_in; ++c)
                    px[c] += trow[x * c_in + c] * w[j];
            }
            float* out = dst + (y * ow + x) * 3;
            // only the RGB non-grayscale path reaches here (gray/c_in==1
            // delegate to ecamp_resize_gray_u8 above)
            for (int64_t c = 0; c < 3; ++c) {
                float vq = static_cast<float>(static_cast<uint8_t>(
                    std::clamp(px[c] + 0.5f, 0.0f, 255.0f)));
                out[c] = (vq / 255.0f - mean) * inv_std;
            }
        }
    }
}

// Crop-resize + grayscale to QUANTIZED u8 — the integer gray value that
// ecamp_resize_norm computes internally before its fused normalize
// (clip8 per pass, then ITU-R 601-2 luma for RGB sources). Emitting u8
// lets the feeder ship 1/6 the bytes of the normalized bf16 3-channel
// tensor over the host->device link; normalization then runs on-device
// (train/pretrain.py::device_normalize). Exact equivalence with the
// fused path is pinned by tests/test_u8_pipe.py.
void ecamp_resize_gray_u8(const uint8_t* src, int64_t sh, int64_t sw,
                          int64_t channels,
                          double box_x0, double box_y0, double box_x1,
                          double box_y1, int64_t oh, int64_t ow,
                          int32_t filter, uint8_t* dst) {
    const FilterTaps hx = compute_taps(sw, ow, box_x0, box_x1, filter);
    const FilterTaps vy = compute_taps(sh, oh, box_y0, box_y1, filter);
    const int64_t c_in = channels;

    int64_t ymin_all = sh, ymax_all = 0;
    for (int64_t y = 0; y < oh; ++y) {
        ymin_all = std::min<int64_t>(ymin_all, vy.bounds[y * 2]);
        ymax_all = std::max<int64_t>(ymax_all,
                                     vy.bounds[y * 2] + vy.bounds[y * 2 + 1]);
    }
    std::vector<float> temp(static_cast<size_t>(ymax_all - ymin_all) * ow * c_in);
    for (int64_t y = ymin_all; y < ymax_all; ++y) {
        const uint8_t* row = src + y * sw * c_in;
        float* trow = temp.data() + (y - ymin_all) * ow * c_in;
        for (int64_t x = 0; x < ow; ++x) {
            int32_t xmin = hx.bounds[x * 2];
            int32_t xsz = hx.bounds[x * 2 + 1];
            const float* w = &hx.weights[static_cast<size_t>(x) * hx.ksize];
            for (int64_t c = 0; c < c_in; ++c) {
                float acc = 0.0f;
                for (int32_t j = 0; j < xsz; ++j)
                    acc += row[(xmin + j) * c_in + c] * w[j];
                trow[x * c_in + c] = static_cast<float>(
                    static_cast<uint8_t>(std::clamp(acc + 0.5f, 0.0f,
                                                    255.0f)));
            }
        }
    }
    for (int64_t y = 0; y < oh; ++y) {
        int32_t ymin = vy.bounds[y * 2];
        int32_t ysz = vy.bounds[y * 2 + 1];
        const float* w = &vy.weights[static_cast<size_t>(y) * vy.ksize];
        for (int64_t x = 0; x < ow; ++x) {
            float px[4] = {0, 0, 0, 0};
            for (int32_t j = 0; j < ysz; ++j) {
                const float* trow = temp.data() +
                    (ymin + j - ymin_all) * ow * c_in;
                for (int64_t c = 0; c < c_in; ++c)
                    px[c] += trow[x * c_in + c] * w[j];
            }
            if (c_in >= 3) {
                // PIL quantizes each resized channel to u8 (clip8), THEN
                // convert('L') applies fixed-point ITU-R 601-2 luma
                // (L24 in Pillow: (19595 r + 38470 g + 7471 b + 0x8000)>>16)
                uint32_t q[3];
                for (int c = 0; c < 3; ++c)
                    q[c] = static_cast<uint8_t>(
                        std::clamp(px[c] + 0.5f, 0.0f, 255.0f));
                dst[y * ow + x] = static_cast<uint8_t>(
                    (19595u * q[0] + 38470u * q[1] + 7471u * q[2]
                     + 0x8000u) >> 16);
            } else {
                dst[y * ow + x] = static_cast<uint8_t>(
                    std::clamp(px[0] + 0.5f, 0.0f, 255.0f));
            }
        }
    }
}

int32_t ecamp_abi_version() { return 2; }

}  // extern "C"
