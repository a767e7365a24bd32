// Native planner core for regent_fft_tpu.
//
// C++ re-design of FFTW's planner kernel (the reference vendors it at
// /root/reference/fftw-3.3.8/kernel/planner.c — a dynamic-programming
// search over solvers with memoization).  On TPU the solver space is the
// radix schedule of MXU matmul stages, so the planner reduces to:
//
//   * exact integer factorization,
//   * a DP over radix schedules minimizing a hardware cost model
//     (MXU contraction efficiency + VPU twiddle cost + stage overhead),
//   * smooth-size search for Bluestein padding.
//
// Exposed as a flat C ABI consumed from Python via ctypes
// (regent_fft_tpu/native/planner.py), which also JIT-builds this file with
// $CXX -O2 -shared -fPIC — the same trick the reference uses to build its
// C++ mapper at Regent compile time (/root/reference/test/test_mapper.rg:
// 15-59).
//
// Build:  make -C regent_fft_tpu/native   (or let planner.py build it)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// Cost model: time units for one radix-r matmul stage applied to a
// length-n problem (per element-batch), on an MXU with EDGE-wide
// contraction.  A stage is a (B*n/r, r) x (r, r) complex matmul:
//   flops  = 8 * n * r   (4 real matmuls)
//   MXU efficiency ~ min(r, EDGE)/EDGE in the contraction dimension
//   twiddle multiply: 6 flops/elem on the VPU between stages
//   fixed per-stage overhead (pipeline drain, layout shuffle)
// ---------------------------------------------------------------------
struct CostParams {
  double mxu_edge = 128.0;      // systolic array edge
  double mxu_rate = 1.0;        // relative MXU flop rate
  double vpu_rate = 0.05;       // relative VPU flop rate (per MXU flop)
  double stage_overhead = 64.0; // per-stage fixed cost (per element: 0.25)
};

double stage_cost(double n, double r, const CostParams& p) {
  double eff = (r >= p.mxu_edge) ? 1.0 : (r / p.mxu_edge);
  // Sub-linear penalty: tiny radices still stream through the MXU pipe.
  if (eff < 0.0625) eff = 0.0625;
  double matmul = 8.0 * n * r / (p.mxu_rate * eff);
  // 6 VPU flops/element for the inter-stage twiddle multiply, converted
  // to MXU-flop time units via the relative VPU rate (vpu_rate = VPU
  // flops per MXU flop per unit time, so time = flops / (mxu_rate*vpu)).
  double twiddle = 6.0 * n / (p.mxu_rate * p.vpu_rate);
  return matmul + twiddle + p.stage_overhead * n * 0.25;
}

std::vector<uint32_t> prime_factors(uint64_t n) {
  std::vector<uint32_t> out;
  for (uint64_t d = 2; d * d <= n; d += (d == 2 ? 1 : 2)) {
    while (n % d == 0) { out.push_back((uint32_t)d); n /= d; }
  }
  if (n > 1) out.push_back((uint32_t)n);
  return out;
}

// Divisors of n that are <= max_radix, descending.
std::vector<uint32_t> small_divisors(uint64_t n, uint32_t max_radix) {
  std::vector<uint32_t> divs;
  for (uint32_t d = 2; d <= max_radix && (uint64_t)d <= n; ++d)
    if (n % d == 0) divs.push_back(d);
  return divs;
}

struct Memo {
  // (n, max_radix) -> (cost, first radix): schedules depend on BOTH.
  std::map<std::pair<uint64_t, uint32_t>, std::pair<double, uint32_t>> best;
  std::mutex mu;
};

double best_cost(uint64_t n, uint32_t max_radix, const CostParams& p, Memo& memo);

double best_cost_uncached(uint64_t n, uint32_t max_radix, const CostParams& p,
                          Memo& memo, uint32_t* first) {
  if (n == 1) { *first = 1; return 0.0; }
  if (n <= max_radix) {
    // Single direct stage — no twiddle after it.
    *first = (uint32_t)n;
    double eff = ((double)n >= p.mxu_edge) ? 1.0 : ((double)n / p.mxu_edge);
    if (eff < 0.0625) eff = 0.0625;
    double direct = 8.0 * (double)n * (double)n / (p.mxu_rate * eff)
                    + p.stage_overhead * (double)n * 0.25;
    // A composite n may still be cheaper split; fall through to compare.
    double best = direct;
    for (uint32_t r : small_divisors(n, max_radix)) {
      if (r == n) continue;
      double c = stage_cost((double)n, (double)r, p)
                 + best_cost(n / r, max_radix, p, memo) * (double)r;
      if (c < best) { best = c; *first = r; }
    }
    return best;
  }
  double best = -1.0;
  for (uint32_t r : small_divisors(n, max_radix)) {
    double c = stage_cost((double)n, (double)r, p)
               + best_cost(n / r, max_radix, p, memo) * (double)r;
    if (best < 0 || c < best) { best = c; *first = r; }
  }
  return best;  // -1 when n has a prime factor > max_radix
}

double best_cost(uint64_t n, uint32_t max_radix, const CostParams& p, Memo& memo) {
  const auto key = std::make_pair(n, max_radix);
  {
    std::lock_guard<std::mutex> g(memo.mu);
    auto it = memo.best.find(key);
    if (it != memo.best.end()) return it->second.first;
  }
  uint32_t first = 0;
  double c = best_cost_uncached(n, max_radix, p, memo, &first);
  std::lock_guard<std::mutex> g(memo.mu);
  memo.best[key] = {c, first};
  return c;
}

Memo g_memo;
CostParams g_params;

}  // namespace

extern "C" {

// Greedy largest-first factorization (parity with the Python fallback).
// Returns count, or 0 if n has a prime factor > max_radix.  out[cap].
int rftp_factorize(uint64_t n, uint32_t max_radix, uint32_t* out, int cap) {
  if (n == 0) return 0;
  if (n == 1) { if (cap > 0) out[0] = 1; return 1; }
  auto primes = prime_factors(n);
  for (auto p : primes)
    if (p > max_radix) return 0;
  // sort descending, group greedily
  std::vector<uint32_t> sorted(primes.rbegin(), primes.rend());
  std::vector<uint32_t> factors;
  uint64_t cur = 1;
  for (uint32_t p : sorted) {
    if (cur * p <= max_radix) cur *= p;
    else { factors.push_back((uint32_t)cur); cur = p; }
  }
  factors.push_back((uint32_t)cur);
  std::sort(factors.rbegin(), factors.rend());
  int cnt = (int)factors.size();
  for (int i = 0; i < cnt && i < cap; ++i) out[i] = factors[i];
  return cnt;
}

// Cost-model DP schedule.  Returns stage count (descending by DP choice),
// or 0 if n is not smooth w.r.t. max_radix.
int rftp_best_schedule(uint64_t n, uint32_t max_radix, uint32_t* out, int cap) {
  if (n == 0) return 0;
  if (n == 1) { if (cap > 0) out[0] = 1; return 1; }
  auto primes = prime_factors(n);
  for (auto p : primes)
    if (p > max_radix) return 0;
  double c = best_cost(n, max_radix, g_params, g_memo);
  (void)c;
  int cnt = 0;
  uint64_t cur = n;
  while (cur > 1 && cnt < cap) {
    // Recompute on miss (the memo may have been cleared concurrently by
    // rftp_set_cost_params); never divide by a default-constructed 0.
    double cc = best_cost(cur, max_radix, g_params, g_memo);
    (void)cc;
    uint32_t r = 0;
    {
      std::lock_guard<std::mutex> g(g_memo.mu);
      auto it = g_memo.best.find(std::make_pair(cur, max_radix));
      if (it == g_memo.best.end() || it->second.second == 0) return 0;
      r = it->second.second;
    }
    out[cnt++] = r;
    cur /= r;
  }
  return cnt;
}

// Smallest 5-smooth size >= n (Bluestein padding).
uint64_t rftp_next_fast_len(uint64_t n) {
  if (n <= 2) return n < 1 ? 1 : n;
  // next power of two is an upper bound
  uint64_t best = 1;
  while (best < n) best <<= 1;
  for (uint64_t p5 = 1; p5 < best; p5 *= 5) {
    for (uint64_t p35 = p5; p35 < best; p35 *= 3) {
      uint64_t q = (n + p35 - 1) / p35;
      uint64_t p2 = 1;
      while (p2 < q) p2 <<= 1;
      uint64_t cand = p35 * p2;
      if (cand >= n && cand < best) best = cand;
    }
  }
  return best;
}

// True algorithmic real-FLOP count of a schedule (api/flops.c analog).
double rftp_stage_flops(uint64_t n, const uint32_t* factors, int count) {
  double fl = 0;
  for (int i = 0; i < count; ++i) {
    fl += 8.0 * (double)n * (double)factors[i];
    if (i + 1 < count) fl += 6.0 * (double)n;
  }
  return fl;
}

// Tune the cost model (called by Python with per-chip numbers).
void rftp_set_cost_params(double mxu_edge, double mxu_rate, double vpu_rate,
                          double stage_overhead) {
  std::lock_guard<std::mutex> g(g_memo.mu);
  g_params.mxu_edge = mxu_edge;
  g_params.mxu_rate = mxu_rate;
  g_params.vpu_rate = vpu_rate;
  g_params.stage_overhead = stage_overhead;
  g_memo.best.clear();
}

int rftp_version() { return 2; }

}  // extern "C"
