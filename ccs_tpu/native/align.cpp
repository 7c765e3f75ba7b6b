// Banded global alignment with traceback — native host kernel.
//
// Exact port of ccs_tpu.ops.align.edit_align's NumPy formulation (same band
// framing, costs, tie-breaking and traceback), called via ctypes. This is
// the host-side bookkeeping aligner (backbone pileup for drafting, window
// boundary mapping — the edlib/KSW2 role in the reference,
// /root/reference/docs/how-does-ccs-work.md:41-55); the consensus itself
// marginalizes over alignments in the pair-HMM on the TPU. The Python loop
// version costs ~150 ms per 2 kb subread; this runs the same DP in ~1 ms,
// keeping the host feeder ahead of the device polish.
//
// Build: g++ -O3 -shared -fPIC -o libccsalign.so align.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int64_t BIG = int64_t(1) << 30;
constexpr int8_t M_DIAG = 0, M_UP = 1, M_LEFT = 2;
}

extern "C" {

// Returns the alignment score, or -1 if the optimal path escapes the band.
//
//   read[R], tpl[T]      int8 base codes (negative = PAD, never matches)
//   centers[R+1]         band center column per read row (monotone, int64)
//   W                    half band width; band columns = centers[i]-W .. +W
//   rpos_at[T+1]         out: lowest read index visited at template pos j
//   ops_rev / ops_len    out: traceback ops (0=M,1=I,2=D), END-FIRST order,
//                        capacity must be >= R+T
//   n_match              out: exact base matches on M columns
int64_t ccs_edit_align(const int8_t* read, int64_t R,
                       const int8_t* tpl, int64_t T,
                       const int64_t* centers, int64_t W,
                       int64_t sub_cost, int64_t gap_cost,
                       int64_t* rpos_at,
                       int8_t* ops_rev, int64_t* ops_len,
                       int64_t* n_match) {
    const int64_t width = 2 * W + 1;
    std::vector<int64_t> prev(width, BIG), cur(width, BIG);
    std::vector<int8_t> moves(size_t(R) * width);

    // row 0: all deletions
    for (int64_t k = 0; k < width; ++k) {
        const int64_t j = centers[0] - W + k;
        if (j >= 0 && j <= T) prev[k] = j * gap_cost;
    }

    for (int64_t i = 1; i <= R; ++i) {
        const int64_t shift = centers[i] - centers[i - 1];
        const int8_t rc = read[i - 1];
        int8_t* mrow = moves.data() + (i - 1) * width;
        int64_t runmin = BIG;  // min over k' <= k of (tmp[k'] - g*k')
        for (int64_t k = 0; k < width; ++k) {
            const int64_t j = centers[i] - W + k;
            const bool valid = (j >= 0 && j <= T);
            // prev frame value at column j (vertical) and j-1 (diagonal)
            const int64_t kp = k + shift;           // same column, prev frame
            const int64_t pv = (kp >= 0 && kp < width) ? prev[kp] : BIG;
            const int64_t kd = kp - 1;              // column j-1, prev frame
            const int64_t dv = (kd >= 0 && kd < width) ? prev[kd] : BIG;
            const int64_t jm1 = j - 1;
            int64_t sub_v = BIG;
            if (jm1 >= 0) {
                const int8_t tc = (jm1 < T) ? tpl[jm1] : int8_t(-2);
                sub_v = dv + ((tc == rc) ? 0 : sub_cost);
            }
            const int64_t ins_v = pv + gap_cost;
            int64_t tmp = sub_v <= ins_v ? sub_v : ins_v;
            int8_t mv = (sub_v <= ins_v) ? M_DIAG : M_UP;
            if (!valid) tmp = BIG;
            // horizontal chain: cur[k] = min_{k'<=k} tmp[k'] + g*(k-k')
            const int64_t shifted = tmp - gap_cost * k;
            if (shifted < runmin) runmin = shifted;
            int64_t c = runmin + gap_cost * k;
            if (c < tmp) mv = M_LEFT;
            if (!valid) c = BIG;
            mrow[k] = mv;
            cur[k] = c;
        }
        std::swap(prev, cur);
    }

    const int64_t end_k = T - centers[R] + W;
    if (end_k < 0 || end_k >= width || prev[end_k] >= BIG) return -1;
    const int64_t score = prev[end_k];

    // traceback from (R, T); backward walk => final write to rpos_at[j] is
    // the lowest read index visited at template position j
    int64_t i = R, k = end_k, nm = 0, no = 0;
    for (;;) {
        const int64_t j = centers[i] - W + k;
        rpos_at[j] = i;
        if (i == 0 && j == 0) break;
        int8_t mv;
        if (i == 0) mv = M_LEFT;
        else if (j == 0) mv = M_UP;
        else mv = moves[(i - 1) * width + k];
        if (mv == M_DIAG) {
            if (read[i - 1] == tpl[j - 1]) ++nm;
            const int64_t shift = centers[i] - centers[i - 1];
            i -= 1; k = k - 1 + shift;
            ops_rev[no++] = M_DIAG;
        } else if (mv == M_UP) {
            const int64_t shift = centers[i] - centers[i - 1];
            i -= 1; k = k + shift;
            ops_rev[no++] = M_UP;
        } else {
            k -= 1;
            ops_rev[no++] = M_LEFT;
        }
    }
    *ops_len = no;
    *n_match = nm;
    return score;
}

}  // extern "C"
