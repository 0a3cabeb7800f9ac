// Measured stand-in for the Rust reference's single-core hot loop.
//
// The reference engine's per-node cost (clean.rs:728-776 _branch_on) is:
// user transition closure -> state hash -> hashbrown map lookup/insert on
// the next layer keeping the max incoming value.  No Rust toolchain
// exists in this image (BASELINE.md), so this C++ replica measures that
// exact loop shape per problem family on THIS host: flat open-addressing
// hash table (hashbrown-equivalent; std::unordered_map would understate
// Rust), FxHash-style multiply hashing, one layer's [W] states expanded
// through D domain values per step.
//
// Families mirror the bench.py kernel-rate shapes:
//   knapsack: state = (depth, capacity) ints, D=2        (knapsack/main.rs:37)
//   misp:     state = 256-bit vertex set, D=2            (misp/main.rs:62)
//   tsptw:    state = 2x256-bit sets + pos + time, D=20  (tsptw/state.rs:34)
//
// Output: one JSON line {"family": expansions_per_sec, ...} consumed by
// bench.py as the per-family vs_baseline denominator.  Build:
//   g++ -O2 -march=native -o ref_baseline ref_baseline.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

static inline uint64_t mix(uint64_t h, uint64_t v) {
  // FxHash-style: multiply-xor per word (fxhash crate, used by the
  // reference for all state maps)
  h = (h ^ v) * 0x517cc1b727220a95ULL;
  return (h << 5) | (h >> 59);
}

// ---------------------------------------------------------------------------
// Flat open-addressing map: key = state words, value = max path value.
// Mirrors hashbrown's probe-until-empty with power-of-two capacity.
// ---------------------------------------------------------------------------
template <int KW>  // key words
struct FlatMap {
  struct Slot {
    uint64_t key[KW];
    int64_t val;
    uint8_t used;
  };
  std::vector<Slot> slots;
  uint64_t mask;
  size_t count = 0;

  explicit FlatMap(size_t cap_pow2) : slots(cap_pow2), mask(cap_pow2 - 1) {}

  void clear() {
    memset(slots.data(), 0, slots.size() * sizeof(Slot));
    count = 0;
  }

  // insert-or-max: the _branch_on dedup rule (>= keeps the later edge).
  // Returns true when a NEW node was created (Entry::Vacant).
  inline bool upsert(const uint64_t *key, int64_t val) {
    uint64_t h = 0x243f6a8885a308d3ULL;
    for (int i = 0; i < KW; i++) h = mix(h, key[i]);
    uint64_t idx = h & mask;
    for (;;) {
      Slot &s = slots[idx];
      if (!s.used) {
        s.used = 1;
        memcpy(s.key, key, KW * sizeof(uint64_t));
        s.val = val;
        count++;
        return true;
      }
      if (memcmp(s.key, key, KW * sizeof(uint64_t)) == 0) {
        if (val >= s.val) s.val = val;
        return false;
      }
      idx = (idx + 1) & mask;
    }
  }
};

// Per-candidate costs the reference pays in _branch_on (clean.rs:735-775):
// Arc::new(transition(..)) = one heap allocation per candidate (freed
// immediately on Entry::Occupied when the fresh Arc drops), an Edge push
// per candidate, and a ~100-byte Node push per distinct state.
struct Edge { uint32_t from, to; int64_t cost; int32_t dval; };
struct NodeRec { int64_t value_top, value_bot, rub; uint32_t best, inbound; uint16_t depth; uint8_t flags; };

template <int KW>
struct BranchCtx {
  std::vector<Edge> edges;
  std::vector<NodeRec> nodes;
  std::vector<void *> live;
  void clear() {
    edges.clear();
    nodes.clear();
    for (void *p : live) free(p);
    live.clear();
  }
  inline void candidate(FlatMap<KW> &next, const uint64_t *key, int64_t val,
                        int64_t cost, uint32_t from) {
    void *arc = malloc(KW * sizeof(uint64_t) + 16);  // Arc<state> + refcounts
    memcpy((char *)arc + 16, key, KW * sizeof(uint64_t));
    bool fresh = next.upsert(key, val);
    edges.push_back(Edge{from, (uint32_t)next.count, cost, 0});
    if (fresh) {
      nodes.push_back(NodeRec{val, INT64_MIN, INT64_MAX, 0, 0, 0, 1});
      live.push_back(arc);
    } else {
      free(arc);  // Entry::Occupied drops the fresh Arc
    }
  }
};

static double now_s() {
  using namespace std::chrono;
  return duration<double>(steady_clock::now().time_since_epoch()).count();
}

// ---------------------------------------------------------------------------
// knapsack: (depth, capacity) states, D = {skip, take}.
// ---------------------------------------------------------------------------
static double bench_knapsack(long target_exp) {
  const int W = 256;
  std::vector<int64_t> cap(W), val(W);
  uint64_t rng = 88172645463325252ULL;
  auto rnd = [&]() { rng ^= rng << 13; rng ^= rng >> 7; rng ^= rng << 17; return rng; };
  for (int i = 0; i < W; i++) { cap[i] = 1000000 - (int64_t)(rnd() % 5000); val[i] = rnd() % 100000; }
  FlatMap<2> next(1024);
  BranchCtx<2> ctx;
  long done = 0;
  int depth = 0;
  double t0 = now_s();
  while (done < target_exp) {
    next.clear();
    ctx.clear();
    for (int i = 0; i < W; i++) {
      int64_t w = 1 + (int64_t)(rnd() % 1000), p = 1 + (int64_t)(rnd() % 1000);
      // skip
      uint64_t k0[2] = {(uint64_t)(depth + 1), (uint64_t)cap[i]};
      ctx.candidate(next, k0, val[i], 0, (uint32_t)i);
      // take (if it fits)
      if (cap[i] >= w) {
        uint64_t k1[2] = {(uint64_t)(depth + 1), (uint64_t)(cap[i] - w)};
        ctx.candidate(next, k1, val[i] + p, p, (uint32_t)i);
      }
      done += 2;
    }
    depth++;
    for (int i = 0; i < W; i++) cap[i] -= (int64_t)(rnd() % 3);  // drift
  }
  return done / (now_s() - t0);
}

// ---------------------------------------------------------------------------
// misp: 256-bit selectable-vertex set, D = {skip, take}.
// ---------------------------------------------------------------------------
static double bench_misp(long target_exp) {
  const int W = 128, N = 171;  // keller4 size
  std::vector<uint64_t> adj(N * 4);
  uint64_t rng = 0x9e3779b97f4a7c15ULL;
  auto rnd = [&]() { rng ^= rng << 13; rng ^= rng >> 7; rng ^= rng << 17; return rng; };
  for (auto &x : adj) x = rnd();
  std::vector<uint64_t> st(W * 4);
  std::vector<int64_t> val(W);
  for (int i = 0; i < W; i++) { for (int k = 0; k < 4; k++) st[i*4+k] = ~0ULL; val[i] = rnd() % 50; }
  FlatMap<4> next(1024);
  BranchCtx<4> ctx;
  long done = 0;
  int v = 0;
  double t0 = now_s();
  while (done < target_exp) {
    next.clear();
    ctx.clear();
    const uint64_t *av = &adj[(v % N) * 4];
    for (int i = 0; i < W; i++) {
      uint64_t *s = &st[i * 4];
      // skip vertex: clear bit v
      uint64_t k0[4] = {s[0], s[1], s[2], s[3]};
      k0[(v % 256) / 64] &= ~(1ULL << (v % 64));
      ctx.candidate(next, k0, val[i], 0, (uint32_t)i);
      // take vertex: remove neighborhood
      uint64_t k1[4] = {k0[0] & ~av[0], k0[1] & ~av[1], k0[2] & ~av[2], k0[3] & ~av[3]};
      ctx.candidate(next, k1, val[i] + 1, 1, (uint32_t)i);
      done += 2;
      // drift the layer so states stay distinct-ish
      s[(i + v) % 4] ^= rnd() & 0xff;
    }
    v++;
  }
  return done / (now_s() - t0);
}

// ---------------------------------------------------------------------------
// tsptw: must/maybe 256-bit sets + position + elapsed, D = 20 candidate
// moves with window feasibility checks (tsptw/model.rs transition).
// ---------------------------------------------------------------------------
static double bench_tsptw(long target_exp) {
  const int W = 128, N = 20;
  uint64_t rng = 0xdeadbeefcafef00dULL;
  auto rnd = [&]() { rng ^= rng << 13; rng ^= rng >> 7; rng ^= rng << 17; return rng; };
  std::vector<int64_t> dist(N * N), twe(N), twl(N);
  for (auto &d : dist) d = rnd() % 1000;
  for (int i = 0; i < N; i++) { twe[i] = rnd() % 5000; twl[i] = twe[i] + 2000; }
  struct S { uint64_t must[4], maybe[4]; int32_t pos; int32_t elapsed; };
  std::vector<S> st(W);
  std::vector<int64_t> val(W);
  for (int i = 0; i < W; i++) {
    for (int k = 0; k < 4; k++) { st[i].must[k] = rnd(); st[i].maybe[k] = rnd(); }
    st[i].pos = (int32_t)(rnd() % N); st[i].elapsed = (int32_t)(rnd() % 3000); val[i] = 0;
  }
  FlatMap<10> next(4096);
  BranchCtx<10> ctx;
  long done = 0;
  double t0 = now_s();
  while (done < target_exp) {
    next.clear();
    ctx.clear();
    for (int i = 0; i < W; i++) {
      const S &s = st[i];
      for (int j = 0; j < N; j++) {
        // domain check: j still to visit?
        if (!((s.must[j / 64] >> (j % 64)) & 1)) { continue; }
        int64_t arr = s.elapsed + dist[s.pos * N + j];
        if (arr > twl[j]) continue;  // window violated
        if (arr < twe[j]) arr = twe[j];
        S t = s;
        t.must[j / 64] &= ~(1ULL << (j % 64));
        t.maybe[j / 64] &= ~(1ULL << (j % 64));
        t.pos = j;
        t.elapsed = (int32_t)arr;
        uint64_t key[10];
        memcpy(key, &t, 8 * sizeof(uint64_t));
        key[8] = (uint64_t)(uint32_t)t.pos;
        key[9] = (uint64_t)(uint32_t)t.elapsed;
        ctx.candidate(next, key, val[i] - dist[s.pos * N + j],
                      -dist[s.pos * N + j], (uint32_t)i);
        done++;
      }
      // drift
      st[i].elapsed = (int32_t)((st[i].elapsed + 7) % 3000);
    }
  }
  return done / (now_s() - t0);
}

int main(int argc, char **argv) {
  long target = argc > 1 ? atol(argv[1]) : 20000000L;
  double kp = bench_knapsack(target);
  double mp = bench_misp(target);
  double tw = bench_tsptw(target);
  printf("{\"knapsack\": %.0f, \"misp\": %.0f, \"tsptw\": %.0f}\n", kp, mp, tw);
  return 0;
}
