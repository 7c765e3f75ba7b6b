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

// Banded global alignment with AFFINE gap costs (Gotoh 3-matrix DP) —
// exact port of ccs_tpu.ops.align.affine_align's NumPy formulation (same
// band framing, prefix-min deletion chain, tie-breaking and traceback).
// The KSW2-equivalent host aligner (how-does-ccs-work.md:53-55).
//
// Returns the alignment cost, or -1 if the optimal path escapes the band.
int64_t ccs_affine_align(const int8_t* read, int64_t R,
                         const int8_t* tpl, int64_t T,
                         const int64_t* centers, int64_t W,
                         int64_t sub_cost, int64_t gap_open, int64_t gap_ext,
                         int64_t* rpos_at,
                         int8_t* ops_rev, int64_t* ops_len,
                         int64_t* n_match) {
    const int64_t width = 2 * W + 1;
    std::vector<int64_t> prevV(width, BIG), prevI(width, BIG);
    std::vector<int64_t> curV(width, BIG), curI(width, BIG);
    // per-row backpointers: V's choice (2 bits) + I/D extension bits
    std::vector<int8_t> vmoves(size_t(R) * width);
    std::vector<int8_t> iexts(size_t(R) * width);
    std::vector<int8_t> dexts(size_t(R + 1) * width);

    for (int64_t k = 0; k < width; ++k) {
        const int64_t j = centers[0] - W + k;
        if (j >= 0 && j <= T)
            prevV[k] = (j == 0) ? 0 : gap_open + j * gap_ext;
    }

    for (int64_t i = 1; i <= R; ++i) {
        const int64_t shift = centers[i] - centers[i - 1];
        const int8_t rc = read[i - 1];
        int8_t* vrow = vmoves.data() + (i - 1) * width;
        int8_t* irow = iexts.data() + (i - 1) * width;
        int8_t* drow = dexts.data() + i * width;
        // running exclusive prefix-min of (U[k'] - ext*k') for the D chain
        int64_t runmin = BIG;
        int64_t d_prev = BIG, u_prev = BIG;  // D[k-1], U[k-1] for ext bit
        for (int64_t k = 0; k < width; ++k) {
            const int64_t j = centers[i] - W + k;
            const bool valid = (j >= 0 && j <= T);
            const int64_t kp = k + shift;
            const int64_t pV = (kp >= 0 && kp < width) ? prevV[kp] : BIG;
            const int64_t pI = (kp >= 0 && kp < width) ? prevI[kp] : BIG;
            const int64_t kd = kp - 1;
            const int64_t dV = (kd >= 0 && kd < width) ? prevV[kd] : BIG;
            const int64_t jm1 = j - 1;
            int64_t m_val = BIG;
            if (jm1 >= 0) {
                const int8_t tc = (jm1 < T) ? tpl[jm1] : int8_t(-2);
                m_val = dV + ((tc == rc) ? 0 : sub_cost);
            }
            const int64_t i_open = pV + gap_open + gap_ext;
            const int64_t i_ext = pI + gap_ext;
            const int64_t i_val = i_ext <= i_open ? i_ext : i_open;
            irow[k] = (i_ext <= i_open) ? 1 : 0;
            int64_t u = m_val <= i_val ? m_val : i_val;
            int8_t mv = (m_val <= i_val) ? M_DIAG : M_UP;
            if (!valid) u = BIG;
            int64_t d_val = BIG;
            if (k > 0 && jm1 >= 0 && runmin < BIG)
                d_val = runmin + gap_ext * k + gap_open;
            if (!valid) d_val = BIG;
            drow[k] = (k > 0 && d_prev < BIG &&
                       d_prev + gap_ext <= u_prev + gap_open + gap_ext)
                          ? 1 : 0;
            int64_t v = u <= d_val ? u : d_val;
            if (d_val < u) mv = M_LEFT;
            if (!valid) v = BIG;
            vrow[k] = mv;
            curV[k] = v;
            curI[k] = valid ? i_val : BIG;
            const int64_t shifted = u - gap_ext * k;  // u already BIG-masked
            if (shifted < runmin) runmin = shifted;
            d_prev = d_val;
            u_prev = u;
        }
        std::swap(prevV, curV);
        std::swap(prevI, curI);
    }

    const int64_t end_k = T - centers[R] + W;
    if (end_k < 0 || end_k >= width || prevV[end_k] >= BIG) return -1;
    const int64_t score = prevV[end_k];

    // traceback with explicit Gotoh state: 0 = V, 1 = I-chain, 2 = D-chain
    int64_t i = R, k = end_k, nm = 0, no = 0;
    int state = 0;
    for (;;) {
        const int64_t j = centers[i] - W + k;
        rpos_at[j] = i;
        if (i == 0 && j == 0) break;
        if (state == 0) {
            if (i == 0) { state = 2; continue; }
            if (j == 0) { state = 1; continue; }
            const int8_t mv = vmoves[(i - 1) * width + k];
            if (mv == M_DIAG) {
                if (read[i - 1] == tpl[j - 1]) ++nm;
                const int64_t shift = centers[i] - centers[i - 1];
                i -= 1; k = k - 1 + shift;
                ops_rev[no++] = M_DIAG;
            } else if (mv == M_UP) state = 1;
            else state = 2;
        } else if (state == 1) {
            const bool was_ext = i > 0 && iexts[(i - 1) * width + k];
            const int64_t shift = centers[i] - centers[i - 1];
            i -= 1; k = k + shift;
            ops_rev[no++] = M_UP;
            state = was_ext ? 1 : 0;
        } else {
            const bool was_ext = i > 0 && dexts[i * width + k];
            k -= 1;
            ops_rev[no++] = M_LEFT;
            state = was_ext ? 2 : 0;
        }
    }
    *ops_len = no;
    *n_match = nm;
    return score;
}

}  // extern "C"
