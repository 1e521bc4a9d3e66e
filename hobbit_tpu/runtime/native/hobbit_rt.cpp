// HOBBIT-TPU native runtime: the host-side C++ core.
//
// TPU-native equivalent of the reference's C++ runtime pieces:
//   - GF(p^2) arithmetic, p = 2^61 - 1       (src/fieldElement.cpp)
//   - BLAKE3 single-block 64B -> 32B compress (Blake/ + Blake3_hash.cpp)
//   - Merkle leaf/level hashing + chained (Merkle-Damgard) chunk leaves
//     (src/merkle_tree.cpp:62-120)
//   - levelized witness producer with a double-buffered background thread
//     (the Seval_Oracle producer/consumer pipeline, Seval.cpp:107-152 <->
//     witness_stream.cpp:1760-1807) — witness generation overlaps device
//     work; Python consumes chunks through ctypes as zero-copy numpy views.
//
// Everything is C ABI (extern "C") so the Python side needs only ctypes.
// Field layout matches the device convention: uint64 pairs (re, im), both
// canonical residues in [0, p).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;
typedef int64_t i64;

static const u64 P = 2305843009213693951ULL;  // 2^61 - 1

static inline u64 canon(u64 x) { return x >= P ? x - P : x; }
static inline u64 addm(u64 a, u64 b) { return canon(a + b); }
static inline u64 subm(u64 a, u64 b) { return canon(a + (P - b)); }
static inline u64 mulm(u64 a, u64 b) {
  u128 z = (u128)a * b;
  u64 lo = (u64)(z & P);
  u64 hi = (u64)(z >> 61);
  return canon(lo + canon(hi));
}

struct F2 {
  u64 re, im;
};

static inline F2 fadd(F2 a, F2 b) { return {addm(a.re, b.re), addm(a.im, b.im)}; }
static inline F2 fsub(F2 a, F2 b) { return {subm(a.re, b.re), subm(a.im, b.im)}; }
static inline F2 fmul(F2 a, F2 b) {
  // Karatsuba 3-mult, i^2 = -1 (fieldElement.cpp:49-78)
  u64 t = mulm(addm(a.re, a.im), addm(b.re, b.im));
  u64 ac = mulm(a.re, b.re);
  u64 bd = mulm(a.im, b.im);
  return {subm(ac, bd), subm(subm(t, ac), bd)};
}

extern "C" {

// ---------------------------------------------------------------------------
// Field vector kernels (batch [n] over interleaved (re, im) pairs)
// ---------------------------------------------------------------------------

void rt_fadd(const u64* a, const u64* b, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) {
    F2 x{a[2 * i], a[2 * i + 1]}, y{b[2 * i], b[2 * i + 1]};
    F2 z = fadd(x, y);
    out[2 * i] = z.re;
    out[2 * i + 1] = z.im;
  }
}

void rt_fmul(const u64* a, const u64* b, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) {
    F2 x{a[2 * i], a[2 * i + 1]}, y{b[2 * i], b[2 * i + 1]};
    F2 z = fmul(x, y);
    out[2 * i] = z.re;
    out[2 * i + 1] = z.im;
  }
}

// sum_i a_i * b_i
void rt_fdot(const u64* a, const u64* b, u64* out, i64 n) {
  F2 acc{0, 0};
  for (i64 i = 0; i < n; i++) {
    F2 x{a[2 * i], a[2 * i + 1]}, y{b[2 * i], b[2 * i + 1]};
    acc = fadd(acc, fmul(x, y));
  }
  out[0] = acc.re;
  out[1] = acc.im;
}

// ---------------------------------------------------------------------------
// BLAKE3 single-block compression (64B message), bit-exact with the
// official spec's single-chunk ROOT path (flags CHUNK_START|CHUNK_END|ROOT)
// ---------------------------------------------------------------------------

static const u32 IV[8] = {0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
                          0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19};
static const int PERM[16] = {2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8};

static inline u32 ror(u32 x, int k) { return (x >> k) | (x << (32 - k)); }

static inline void g(u32* v, int a, int b, int c, int d, u32 mx, u32 my) {
  v[a] = v[a] + v[b] + mx;
  v[d] = ror(v[d] ^ v[a], 16);
  v[c] = v[c] + v[d];
  v[b] = ror(v[b] ^ v[c], 12);
  v[a] = v[a] + v[b] + my;
  v[d] = ror(v[d] ^ v[a], 8);
  v[c] = v[c] + v[d];
  v[b] = ror(v[b] ^ v[c], 7);
}

static void compress64(const u32* m_in, u32* out) {
  u32 v[16];
  u32 m[16];
  memcpy(m, m_in, 64);
  for (int i = 0; i < 8; i++) v[i] = IV[i];
  for (int i = 0; i < 4; i++) v[8 + i] = IV[i];
  v[12] = 0;
  v[13] = 0;
  v[14] = 64;
  v[15] = 11;  // CHUNK_START | CHUNK_END | ROOT
  for (int r = 0; r < 7; r++) {
    g(v, 0, 4, 8, 12, m[0], m[1]);
    g(v, 1, 5, 9, 13, m[2], m[3]);
    g(v, 2, 6, 10, 14, m[4], m[5]);
    g(v, 3, 7, 11, 15, m[6], m[7]);
    g(v, 0, 5, 10, 15, m[8], m[9]);
    g(v, 1, 6, 11, 12, m[10], m[11]);
    g(v, 2, 7, 8, 13, m[12], m[13]);
    g(v, 3, 4, 9, 14, m[14], m[15]);
    if (r < 6) {
      u32 nm[16];
      for (int i = 0; i < 16; i++) nm[i] = m[PERM[i]];
      memcpy(m, nm, 64);
    }
  }
  for (int i = 0; i < 8; i++) out[i] = v[i] ^ v[8 + i];
}

// batch: n messages of 16 words -> n digests of 8 words
void rt_blake3_compress64(const u32* msgs, u32* out, i64 n) {
  for (i64 i = 0; i < n; i++) compress64(msgs + 16 * i, out + 8 * i);
}

// hash n leaves of 4 field elements each (64B little-endian packing,
// matching ops/blake3.fields_to_words)
void rt_blake3_field_leaves(const u64* fields, u32* out, i64 n) {
  for (i64 i = 0; i < n; i++) {
    u32 m[16];
    memcpy(m, fields + 8 * i, 64);
    compress64(m, out + 8 * i);
  }
}

// chained chunk leaves: out = H(prev || fields_i) per leaf — the reference's
// Merkle-Damgard accumulation of streamed chunks (merkle_tree.cpp:62-88).
// fields: n leaves x 4 field elements; prev/out: n x 8 words.
void rt_blake3_chained(const u64* fields, const u32* prev, u32* out, i64 n) {
  for (i64 i = 0; i < n; i++) {
    u32 m[16];
    // first 32B: the 4 field elements' low halves? NO — chained layout
    // matches ops/blake3.hash_chained_leaf: message = fields(64B) hashed,
    // then combined with prev as H(prev || digest).
    memcpy(m, fields + 8 * i, 64);
    u32 d[8];
    compress64(m, d);
    u32 m2[16];
    memcpy(m2, prev + 8 * i, 32);
    memcpy(m2 + 8, d, 32);
    compress64(m2, out + 8 * i);
  }
}

// one Merkle level: parents[i] = H(left[2i] || left[2i+1])
void rt_merkle_level(const u32* level, u32* parents, i64 n_pairs) {
  for (i64 i = 0; i < n_pairs; i++) {
    u32 m[16];
    memcpy(m, level + 16 * i, 64);
    compress64(m, parents + 8 * i);
  }
}

// full tree from n (pow2) leaf digests; out must hold 2n-1 digests laid out
// level by level (leaves first).  Returns root offset (in digests).
i64 rt_merkle_tree(const u32* leaves, u32* out, i64 n) {
  memcpy(out, leaves, (size_t)n * 32);
  i64 off = 0, cur = n;
  while (cur > 1) {
    rt_merkle_level(out + 8 * off, out + 8 * (off + cur), cur / 2);
    off += cur;
    cur /= 2;
  }
  return off;  // root at out[8*off .. 8*off+8]
}

// ---------------------------------------------------------------------------
// Levelized witness producer (the Seval_Oracle analog)
// ---------------------------------------------------------------------------
// Program representation (flattened levels):
//   gate g: type in {0 pad, 1 add, 2 mul, >=3 lookup(table = type - 3)}
//   idx_l/idx_r: operand wire labels; output wire label = num_inputs + g
// Tables: concatenated u64 entries with offsets.

// Program representation: flattened parallel arrays (see rt_eval args).
// Tables are concatenated values with (offset, stride) pairs in tab_off;
// a lookup gate of type t reads tables[off + l.re * stride + r.re].

// evaluate the whole program; gates in level order, outputs scattered to
// their emission-order wire labels idx_o; out_l/out_r/out_o: [num_gates*2]
void rt_eval(const u32* types, const i64* idx_l, const i64* idx_r,
             const i64* idx_o, const u64* inputs, const u64* tables,
             const i64* tab_off, i64 num_gates, i64 num_inputs, u64* out_l,
             u64* out_r, u64* out_o) {
  std::vector<F2> mem((size_t)(num_inputs + num_gates));
  for (i64 i = 0; i < num_inputs; i++)
    mem[i] = {inputs[2 * i], inputs[2 * i + 1]};
  for (i64 g = 0; g < num_gates; g++) {
    F2 l = mem[idx_l[g]];
    F2 r = mem[idx_r[g]];
    F2 o{0, 0};
    u32 t = types[g];
    if (t == 1) {
      o = fadd(l, r);
    } else if (t == 2) {
      o = fmul(l, r);
    } else if (t >= 3) {
      // lookup convention (streams/trace.py:_apply_level): 1-D tables,
      // key = l.re + 256 * r.re, clamped into the table like the device
      // path's jnp.clip (out-of-range keys on benchmark circuits)
      i64 t0 = tab_off[t - 3];
      i64 len = tab_off[t - 2] - t0;
      u64 addr64 = l.re + 256 * r.re;
      i64 addr = (addr64 >= (u64)len) ? len - 1 : (i64)addr64;
      o = {tables[t0 + addr], 0};
    }
    mem[idx_o[g]] = o;
    out_l[2 * g] = l.re;
    out_l[2 * g + 1] = l.im;
    out_r[2 * g] = r.re;
    out_r[2 * g + 1] = r.im;
    out_o[2 * g] = o.re;
    out_o[2 * g + 1] = o.im;
  }
}

// ---------------------------------------------------------------------------
// Background producer: double-buffered chunk pipeline
// ---------------------------------------------------------------------------

struct Producer {
  std::thread th;
  std::mutex mtx;
  std::condition_variable cv;
  std::vector<u64> bufs[2];  // interleaved (L, R, O) triples per gate
  i64 chunk_gates = 0;
  i64 total_gates = 0;
  i64 produced = 0;          // chunks produced
  i64 consumed = 0;          // chunks consumed
  bool ready[2] = {false, false};
  bool stop = false;
  // program copy (slot-renamed: il/ir/io index the O(slots) memory, not
  // the O(N) wire space; feeds load input values into slots at their
  // first-use position — the reference's slot-reclaiming emitter)
  std::vector<u32> types;
  std::vector<i64> il, ir, io;
  std::vector<u64> inputs, tables;
  std::vector<i64> toff;
  std::vector<i64> feed_pos, feed_slot, feed_label;
  i64 num_inputs = 0;
  i64 num_slots = 0;
};

static void producer_loop(Producer* p) {
  // re-evaluates the circuit forever, chunk by chunk (the reference's
  // infinite Seval loop restarting at the sentinel, Seval.cpp:1292-1299).
  // Memory is O(num_slots) — the liveness allocator's peak — not O(N):
  // inputs stream into slots at their scheduled feed position.
  std::vector<F2> mem;
  while (true) {
    mem.assign((size_t)p->num_slots, F2{0, 0});
    size_t fp = 0;
    for (i64 start = 0; start < p->total_gates; start += p->chunk_gates) {
      int slot = (int)((p->produced) & 1);
      {
        std::unique_lock<std::mutex> lk(p->mtx);
        p->cv.wait(lk, [&] { return p->stop || !p->ready[slot]; });
        if (p->stop) return;
      }
      u64* out = p->bufs[slot].data();
      i64 end = start + p->chunk_gates;
      if (end > p->total_gates) end = p->total_gates;
      for (i64 g = start; g < end; g++) {
        while (fp < p->feed_pos.size() && p->feed_pos[fp] <= g) {
          i64 lbl = p->feed_label[fp];
          mem[p->feed_slot[fp]] = {p->inputs[2 * lbl],
                                   p->inputs[2 * lbl + 1]};
          fp++;
        }
        F2 l = mem[p->il[g]];
        F2 r = mem[p->ir[g]];
        F2 o{0, 0};
        u32 t = p->types[g];
        if (t == 1) o = fadd(l, r);
        else if (t == 2) o = fmul(l, r);
        else if (t >= 3) {
          i64 t0 = p->toff[t - 3];
          i64 len = p->toff[t - 2] - t0;
          u64 addr64 = l.re + 256 * r.re;
          i64 addr = (addr64 >= (u64)len) ? len - 1 : (i64)addr64;
          o = {p->tables[t0 + addr], 0};
        }
        mem[p->io[g]] = o;
        i64 j = g - start;
        out[6 * j] = l.re; out[6 * j + 1] = l.im;
        out[6 * j + 2] = r.re; out[6 * j + 3] = r.im;
        out[6 * j + 4] = o.re; out[6 * j + 5] = o.im;
      }
      for (i64 j = end - start; j < p->chunk_gates; j++)
        memset(out + 6 * j, 0, 48);
      {
        std::lock_guard<std::mutex> lk(p->mtx);
        p->ready[slot] = true;
        p->produced++;
      }
      p->cv.notify_all();
    }
  }
}

// idx_l/idx_r/idx_o are SLOT indices (liveness-renamed); feeds schedule
// input loads: before gate feed_pos[i] runs, inputs[feed_label[i]] is
// stored into slot feed_slot[i].
void* rt_producer_start(const u32* types, const i64* idx_l, const i64* idx_r,
                        const i64* idx_o, const u64* inputs,
                        const u64* tables, const i64* tab_off,
                        i64 num_tables, i64 num_gates, i64 num_inputs,
                        i64 num_slots, const i64* feed_pos,
                        const i64* feed_slot, const i64* feed_label,
                        i64 num_feeds, i64 chunk_gates) {
  Producer* p = new Producer();
  p->types.assign(types, types + num_gates);
  p->il.assign(idx_l, idx_l + num_gates);
  p->ir.assign(idx_r, idx_r + num_gates);
  p->io.assign(idx_o, idx_o + num_gates);
  p->inputs.assign(inputs, inputs + 2 * num_inputs);
  p->num_slots = num_slots;
  p->feed_pos.assign(feed_pos, feed_pos + num_feeds);
  p->feed_slot.assign(feed_slot, feed_slot + num_feeds);
  p->feed_label.assign(feed_label, feed_label + num_feeds);
  if (num_tables > 0) {
    i64 total_len = tab_off[num_tables];  // [num_tables+1] offsets
    p->tables.assign(tables, tables + total_len);
    p->toff.assign(tab_off, tab_off + num_tables + 1);
  }
  p->num_inputs = num_inputs;
  p->total_gates = num_gates;
  p->chunk_gates = chunk_gates;
  p->bufs[0].assign((size_t)(6 * chunk_gates), 0);
  p->bufs[1].assign((size_t)(6 * chunk_gates), 0);
  p->th = std::thread(producer_loop, p);
  return p;
}

// blocks until the next chunk is ready; copies it into out [6*chunk_gates]
void rt_producer_next(void* handle, u64* out) {
  Producer* p = (Producer*)handle;
  int slot = (int)(p->consumed & 1);
  {
    std::unique_lock<std::mutex> lk(p->mtx);
    p->cv.wait(lk, [&] { return p->ready[slot]; });
  }
  memcpy(out, p->bufs[slot].data(),
         (size_t)(6 * p->chunk_gates) * sizeof(u64));
  {
    std::lock_guard<std::mutex> lk(p->mtx);
    p->ready[slot] = false;
    p->consumed++;
  }
  p->cv.notify_all();
}

void rt_producer_stop(void* handle) {
  Producer* p = (Producer*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mtx);
    p->stop = true;
    p->ready[0] = p->ready[1] = false;
  }
  p->cv.notify_all();
  p->th.join();
  delete p;
}

}  // extern "C"
