// Franke-Taylor-style stochastic Reed-Solomon list decoder over GF(64).
//
// Native companion to cwsl_digi_tpu/modes/qary_engine.py: the hot trial
// loop of the errors-and-erasures list decode for JT65 RS(63,12) and
// Q65 RS(63,13).  The reference gets this capability from jt9.exe's
// linked Fortran libraries (source/CWSL_DIGI.vcxproj:136-137); the
// algorithm family is the Franke-Taylor soft decoder (QEX Mar/Apr 2016):
// thousands of stochastic erasure patterns biased by per-symbol
// reliability, each tried with a Berlekamp-Massey errors-and-erasures
// decode, candidates validated by a soft re-encode score.
//
// Perf structure: syndromes are computed ONCE per received word (they do
// not depend on the erasure pattern); the per-trial work is erasure
// locator + modified syndromes + BM + a Chien search over only the
// (tiny) error locator — erasure roots are known a priori.  Validation
// is the soft score, not a syndrome re-check (cheaper and stronger).
// Trials are sharded across threads.
//
// Exposed via ctypes (cwsl_digi_tpu/native.py).  Field/generator match
// cwsl_digi_tpu/modes/rs64.py: GF(2^6), primitive poly x^6+x+1,
// g(x) = prod_{i=1..n-k} (x - alpha^i), codeword = [info | parity],
// syndrome S_i = c(alpha^i) with word[j] the coefficient of x^(62-j).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cmath>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int N = 63;
constexpr int PRIM = 0x43;  // x^6 + x + 1

struct GF64 {
    int exp[2 * N];
    int log[N + 1];
    GF64() {
        int x = 1;
        for (int i = 0; i < N; ++i) {
            exp[i] = x;
            log[x] = i;
            x <<= 1;
            if (x & 0x40) x ^= PRIM;
        }
        for (int i = 0; i < N; ++i) exp[N + i] = exp[i];
        log[0] = 0;  // unused sentinel
    }
    inline int mul(int a, int b) const {
        if (a == 0 || b == 0) return 0;
        return exp[log[a] + log[b]];
    }
    inline int div(int a, int b) const {  // b != 0
        if (a == 0) return 0;
        return exp[(log[a] - log[b] + N) % N];
    }
    inline int pow_alpha(int p) const {  // alpha^p, p may be negative
        int r = p % N;
        if (r < 0) r += N;
        return exp[r];
    }
};

const GF64 gf;

// generator polynomial with roots alpha^fcr..alpha^(fcr+n_parity-1),
// lowest-order-first coefficients g[0..n_parity], monic.  JT65 uses the
// Karn codec parameters fcr=3 (init_rs_int(6,0x43,3,1,51)).
std::vector<int> generator_poly(int n_parity, int fcr) {
    std::vector<int> g{1};
    for (int i = fcr; i <= fcr + n_parity - 1; ++i) {
        std::vector<int> ng(g.size() + 1, 0);
        int ai = gf.exp[i % N];
        for (size_t j = 0; j < g.size(); ++j) {
            ng[j + 1] ^= g[j];
            ng[j] ^= gf.mul(ai, g[j]);
        }
        g.swap(ng);
    }
    return g;
}

struct RS {
    int k;
    int fcr;
    int n_parity;
    std::vector<int> g;  // lowest-first
    explicit RS(int k_, int fcr_ = 1)
        : k(k_), fcr(fcr_), n_parity(N - k_),
          g(generator_poly(N - k_, fcr_)) {}

    void encode(const int32_t* info, int32_t* word) const {
        std::vector<int> rem(n_parity, 0);
        for (int i = 0; i < k; ++i) {
            int fb = (int)info[i] ^ rem[0];
            for (int j = 0; j < n_parity - 1; ++j)
                rem[j] = rem[j + 1] ^ gf.mul(fb, g[n_parity - 1 - j]);
            rem[n_parity - 1] = gf.mul(fb, g[0]);
            word[i] = info[i];
        }
        for (int j = 0; j < n_parity; ++j) word[k + j] = rem[j];
    }

    // returns true if any syndrome nonzero; S_j = c(alpha^(fcr+j))
    bool syndromes(const int32_t* word, int* synd) const {
        bool nz = false;
        for (int i = fcr; i <= fcr + n_parity - 1; ++i) {
            int s = 0;
            for (int j = 0; j < N; ++j) {
                if (word[j])
                    s ^= gf.exp[(gf.log[word[j]] + i * (N - 1 - j)) % N];
            }
            synd[i - fcr] = s;
            nz |= (s != 0);
        }
        return nz;
    }

    // errors-and-erasures decode from precomputed syndromes of `received`.
    // On success writes the corrected info symbols to out_info.
    // No final syndrome verification — the caller validates candidates by
    // soft score (stronger and cheaper for this list-decoding use).
    bool decode_with_synd(const int32_t* received, const int* synd,
                          const int* erasures, int n_erasures,
                          int32_t* out_info) const {
        if (n_erasures > n_parity) return false;

        // erasure locator gamma(x) = prod (1 + x*X_i), X_i = alpha^(N-1-pos)
        int gamma[64];
        int glen = 1;
        gamma[0] = 1;
        for (int e = 0; e < n_erasures; ++e) {
            int xi_log = (N - 1 - erasures[e]) % N;
            gamma[glen] = 0;
            for (int j = glen; j >= 1; --j) {
                int gj = gamma[j - 1];
                if (gj)
                    gamma[j] ^= gf.exp[(gf.log[gj] + xi_log) % N];
            }
            ++glen;
        }
        // modified syndromes: S'(x) = S(x)*gamma(x) mod x^n_parity
        int ms[64];
        for (int i = 0; i < n_parity; ++i) {
            int acc = 0;
            int jmax = std::min(i + 1, glen);
            for (int j = 0; j < jmax; ++j)
                acc ^= gf.mul(gamma[j], synd[i - j]);
            ms[i] = acc;
        }
        // Berlekamp-Massey on modified syndromes for the error locator
        int lam[64], prev[64];
        int lam_len = 1, prev_len = 1;
        lam[0] = 1;
        prev[0] = 1;
        int L = 0, m = 1, b = 1;
        int bm_iters = n_parity - n_erasures;
        for (int i = 0; i < bm_iters; ++i) {
            int delta = 0;
            int jmax = std::min(L + 1, lam_len);
            for (int j = 0; j < jmax; ++j)
                delta ^= gf.mul(lam[j], ms[n_erasures + i - j]);
            if (delta == 0) {
                ++m;
                continue;
            }
            int coef = gf.div(delta, b);
            int coef_log = gf.log[coef];
            if (2 * L <= i) {
                int t[64], t_len = lam_len;
                std::memcpy(t, lam, lam_len * sizeof(int));
                int new_len = std::max(lam_len, prev_len + m);
                for (int j = lam_len; j < new_len; ++j) lam[j] = 0;
                for (int j = 0; j < prev_len; ++j) {
                    int pj = prev[j];
                    if (pj)
                        lam[j + m] ^= gf.exp[(coef_log + gf.log[pj]) % N];
                }
                lam_len = new_len;
                std::memcpy(prev, t, t_len * sizeof(int));
                prev_len = t_len;
                L = i + 1 - L;
                b = delta;
                m = 1;
            } else {
                int new_len = std::max(lam_len, prev_len + m);
                for (int j = lam_len; j < new_len; ++j) lam[j] = 0;
                for (int j = 0; j < prev_len; ++j) {
                    int pj = prev[j];
                    if (pj)
                        lam[j + m] ^= gf.exp[(coef_log + gf.log[pj]) % N];
                }
                lam_len = new_len;
                ++m;
            }
        }
        while (lam_len > 1 && lam[lam_len - 1] == 0) --lam_len;
        int deg_lam = lam_len - 1;
        if (deg_lam + n_erasures > n_parity) return false;

        // Chien search over the error locator only (erasure roots known)
        int err_pos[64], n_err = 0;
        if (deg_lam > 0) {
            for (int pos = 0; pos < N; ++pos) {
                int xinv_log = (N - (N - 1 - pos) % N) % N;
                int v = lam[0];
                for (int j = 1; j < lam_len; ++j) {
                    if (lam[j])
                        v ^= gf.exp[(gf.log[lam[j]] + j * xinv_log) % N];
                }
                if (v == 0) err_pos[n_err++] = pos;
            }
            if (n_err != deg_lam) return false;
        }

        // full locator = lam * gamma (for Forney numerator/denominator)
        int locator[128];
        int loc_len = lam_len + glen - 1;
        std::memset(locator, 0, loc_len * sizeof(int));
        for (int i = 0; i < lam_len; ++i) {
            int li = lam[i];
            if (!li) continue;
            int li_log = gf.log[li];
            for (int j = 0; j < glen; ++j) {
                int gj = gamma[j];
                if (gj)
                    locator[i + j] ^= gf.exp[(li_log + gf.log[gj]) % N];
            }
        }
        // omega(x) = S(x)*locator(x) mod x^n_parity
        int omega[64];
        for (int i = 0; i < n_parity; ++i) {
            int acc = 0;
            int jmax = std::min(i + 1, loc_len);
            for (int j = 0; j < jmax; ++j) {
                int lj = locator[j];
                if (lj)
                    acc ^= gf.mul(lj, synd[i - j]);
            }
            omega[i] = acc;
        }

        int32_t word[N];
        std::memcpy(word, received, sizeof(word));
        // correct erasure positions and error positions via Forney
        auto forney = [&](int pos) -> bool {
            int xinv_log = (N - (N - 1 - pos) % N) % N;
            int num = 0;
            for (int j = 0; j < n_parity; ++j) {
                int oj = omega[j];
                if (oj)
                    num ^= gf.exp[(gf.log[oj] + j * xinv_log) % N];
            }
            int den = 0;
            for (int j = 1; j < loc_len; j += 2) {
                int lj = locator[j];
                if (lj)
                    den ^= gf.exp[(gf.log[lj] + (j - 1) * xinv_log) % N];
            }
            if (den == 0) return false;
            int mag = gf.div(num, den);
            // generalized Forney: e = X^(1-fcr) * omega(X^-1)/Lambda'(X^-1)
            if (fcr != 1 && mag)
                mag = gf.mul(mag, gf.pow_alpha((N - 1 - pos) * (1 - fcr)));
            word[pos] ^= mag;
            return word[pos] >= 0 && word[pos] < 64;
        };
        for (int e = 0; e < n_erasures; ++e)
            if (!forney(erasures[e])) return false;
        for (int e = 0; e < n_err; ++e)
            if (!forney(err_pos[e])) return false;

        std::memcpy(out_info, word, k * sizeof(int32_t));
        return true;
    }

    bool decode(int32_t* word, const int* erasures, int n_erasures) const {
        int synd[64];
        if (!syndromes(word, synd)) return true;
        int32_t info[64];
        if (!decode_with_synd(word, synd, erasures, n_erasures, info))
            return false;
        // full verified decode for the standalone entry point
        int32_t cw[N];
        encode(info, cw);
        int synd2[64];
        if (syndromes(cw, synd2)) return false;
        std::memcpy(word, cw, sizeof(cw));
        return true;
    }
};

// xorshift64* PRNG (deterministic across platforms)
struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ull) {}
    inline uint64_t next() {
        s ^= s >> 12;
        s ^= s << 25;
        s ^= s >> 27;
        return s * 0x2545F4914F6CDD1Dull;
    }
    inline double uniform() { return (next() >> 11) * 0x1.0p-53; }
};

// soft re-encode score (same formula as QaryDecoder._soft_score):
// mean over symbols of log(E[cw tone] / mean symbol energy); tones outside
// the stored top-4 get the mean residual energy.
double soft_score(const int32_t* cw, const float* top_e,
                  const int32_t* top_tone, const float* e_sum, int n_tones) {
    double acc = 0.0;
    for (int s = 0; s < N; ++s) {
        const float* te = top_e + 4 * s;
        const int32_t* tt = top_tone + 4 * s;
        double e_cw = -1.0;
        double top_sum = 0.0;
        for (int j = 0; j < 4; ++j) {
            top_sum += te[j];
            if (tt[j] == cw[s]) e_cw = te[j];
        }
        if (e_cw < 0.0) e_cw = (e_sum[s] - top_sum) / (n_tones - 4);
        double mean_e = e_sum[s] / n_tones;
        acc += std::log((e_cw + 1e-30) / (mean_e + 1e-30));
    }
    return acc / N;
}

struct FtShared {
    std::mutex mu;
    double best_score = -1e9;
    int32_t best_info[64];
    std::atomic<bool> stop{false};
};

void ft_worker(const RS& rs, const int32_t* syms, const int* synd,
               const float* margin, const double* p_erase, const int* order,
               const float* top_e, const int32_t* top_tone,
               const float* e_sum, int n_tones, int trials, uint64_t seed,
               double accept_thresh, double early_exit, FtShared* shared) {
    Rng rng(seed);
    int erasures[64];
    int32_t info[64];
    int32_t cw[N];
    std::vector<std::pair<float, int>> sampled;
    sampled.reserve(N);
    int f_mid = std::max(0, rs.n_parity - 11);
    int f_deep = rs.n_parity - 2;
    for (int t = 0; t < trials; ++t) {
        if ((t & 63) == 0 && shared->stop.load(std::memory_order_relaxed))
            return;
        int f_target = (t < trials / 4) ? f_mid : f_deep;
        sampled.clear();
        for (int i = 0; i < N; ++i)
            if (rng.uniform() < p_erase[i]) sampled.push_back({margin[i], i});
        if ((int)sampled.size() > f_target) {
            std::partial_sort(sampled.begin(), sampled.begin() + f_target,
                              sampled.end());
            sampled.resize(f_target);
        }
        for (size_t j = 0; j < sampled.size(); ++j)
            erasures[j] = sampled[j].second;
        if (!rs.decode_with_synd(syms, synd, erasures, (int)sampled.size(),
                                 info))
            continue;
        rs.encode(info, cw);
        double s = soft_score(cw, top_e, top_tone, e_sum, n_tones);
        if (s >= accept_thresh) {
            std::lock_guard<std::mutex> lock(shared->mu);
            if (s > shared->best_score) {
                shared->best_score = s;
                std::memcpy(shared->best_info, info,
                            rs.k * sizeof(int32_t));
                if (s >= early_exit)
                    shared->stop.store(true, std::memory_order_relaxed);
            }
        }
    }
    (void)order;
}

}  // namespace

extern "C" {

// Stochastic FT list decode.  Inputs are per-candidate arrays of length 63
// (top_e/top_tone are 63x4 row-major).  Returns the best soft score found
// (>= accept_thresh) and writes the info symbols to out_info; returns -1e9
// if no acceptable codeword was found.
double rs_ft_decode(int k, const int32_t* syms, const float* margin,
                    const float* top_e, const int32_t* top_tone,
                    const float* e_sum, int n_tones, int trials,
                    uint64_t seed, double accept_thresh, double early_exit,
                    int32_t* out_info, int fcr) {
    RS rs(k, fcr);
    // syndromes once — identical for every erasure pattern
    int synd[64];
    bool nonzero = rs.syndromes(syms, synd);

    // reliability ranks: rank 0 = least confident
    int order[N];
    for (int i = 0; i < N; ++i) order[i] = i;
    std::sort(order, order + N,
              [&](int a, int b) { return margin[a] < margin[b]; });
    double p_erase[N];
    for (int r = 0; r < N; ++r)
        p_erase[order[r]] = 0.9 - 0.8 * (double)r / (N - 1);

    FtShared shared;
    int32_t info[64];
    int32_t cw[N];
    int erasures[64];

    if (!nonzero) {
        // received word is already a codeword
        rs.encode(syms, cw);  // treat first k as info; re-encode for score
        double s = soft_score(cw, top_e, top_tone, e_sum, n_tones);
        if (s >= accept_thresh) {
            std::memcpy(out_info, syms, k * sizeof(int32_t));
            return s;
        }
        return -1e9;
    }

    // tier 0: deterministic progressive erasure schedule
    static const int SCHED[] = {0, 8, 16, 24, 32, 40, 48};
    for (int si = 0; si < 7; ++si) {
        int f = SCHED[si];
        if (f > rs.n_parity) break;
        for (int j = 0; j < f; ++j) erasures[j] = order[j];
        if (rs.decode_with_synd(syms, synd, erasures, f, info)) {
            rs.encode(info, cw);
            double s = soft_score(cw, top_e, top_tone, e_sum, n_tones);
            if (s >= accept_thresh && s > shared.best_score) {
                shared.best_score = s;
                std::memcpy(shared.best_info, info, k * sizeof(int32_t));
                if (s >= early_exit) {
                    std::memcpy(out_info, info, k * sizeof(int32_t));
                    return s;
                }
            }
        }
    }

    // stochastic tiers, sharded across threads
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = (int)std::min<unsigned>(hw ? hw : 1, 8);
    if (trials < 512) n_threads = 1;
    int per = trials / n_threads;
    std::vector<std::thread> workers;
    for (int w = 0; w < n_threads; ++w) {
        workers.emplace_back(ft_worker, std::cref(rs), syms, synd, margin,
                             p_erase, order, top_e, top_tone, e_sum, n_tones,
                             per, seed + 0x9E3779B9ull * (w + 1),
                             accept_thresh, early_exit, &shared);
    }
    for (auto& th : workers) th.join();

    if (shared.best_score <= -1e8) return -1e9;
    std::memcpy(out_info, shared.best_info, k * sizeof(int32_t));
    return shared.best_score;
}

// plain errors-and-erasures decode (for tests / parity checks)
int rs_ee_decode(int k, const int32_t* syms, const int32_t* erasures,
                 int n_erasures, int32_t* out_info, int fcr) {
    RS rs(k, fcr);
    int32_t word[N];
    std::memcpy(word, syms, sizeof(word));
    std::vector<int> er(erasures, erasures + n_erasures);
    if (!rs.decode(word, er.data(), n_erasures)) return 0;
    std::memcpy(out_info, word, k * sizeof(int32_t));
    return 1;
}

// systematic encode (for tests)
void rs_encode63(int k, const int32_t* info, int32_t* out_word, int fcr) {
    RS rs(k, fcr);
    rs.encode(info, out_word);
}

}  // extern "C"
