// yabpe native runtime: GPT-2 pre-tokenizer scanner + word-frequency counter.
//
// Hand-written scanner for the GPT-2 split pattern
//   '(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+
// (behavioral parity targets: /root/reference/src/yet_another_bpe/
// tokenizer.py:45 and trainer.py:162-169). Because the alternation covers
// every character, regex `findall` produces contiguous matches with
// alternation priority applied at each match start — so a left-to-right
// token-by-token scan with per-position alternative priority is exactly
// equivalent, and runs ~20x faster than the backtracking regex engine.
//
// Character classes (\p{L}, \p{N}, \s) come from unicode_tables.h, which is
// generated from the *installed* `regex` module so classification parity is
// by construction (see gen_tables.py). Input must be valid UTF-8 (the
// Python layer validates and reports positioned errors first, matching the
// reference's decode error behavior at trainer.py:155-160).
//
// Exposed C API (ctypes-consumed from yabpe_tpu.native):
//   yabpe_pretok_offsets  — token end-offsets for the encode path
//   yabpe_counter_*       — pre-tokenize + aggregate word frequencies for
//                           the training ingest path (the reference's
//                           ThreadPoolExecutor+findall+Counter pipeline,
//                           trainer.py:201-213, collapsed into native code)
//
// All state lives in handles; every entry point is thread-safe for
// distinct handles (Python drives parallelism with a thread pool; ctypes
// releases the GIL for the duration of each call).

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <stddef.h>
#include <string.h>

#ifdef __linux__
#include <sys/mman.h>
#endif

#include <algorithm>
#include <array>
#include <mutex>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

#include "unicode_tables.h"

namespace {

// ---------------------------------------------------------------------------
// Codepoint classification: binary search over generated ranges, with flat
// lookup tables for the Latin-1 fast path (covers virtually all real text).
// ---------------------------------------------------------------------------

bool in_ranges(const uint32_t (*ranges)[2], size_t n, uint32_t cp) {
  size_t lo = 0, hi = n;
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    if (cp < ranges[mid][0]) {
      hi = mid;
    } else if (cp > ranges[mid][1]) {
      lo = mid + 1;
    } else {
      return true;
    }
  }
  return false;
}

struct Ascii {
  uint8_t letter[256];
  uint8_t number[256];
  uint8_t space[256];
  Ascii() {
    for (uint32_t c = 0; c < 256; ++c) {
      letter[c] = in_ranges(YABPE_LETTER_RANGES, YABPE_LETTER_RANGES_len, c);
      number[c] = in_ranges(YABPE_NUMBER_RANGES, YABPE_NUMBER_RANGES_len, c);
      space[c] = in_ranges(YABPE_SPACE_RANGES, YABPE_SPACE_RANGES_len, c);
    }
  }
};
const Ascii kAscii;

inline bool is_letter(uint32_t cp) {
  if (cp < 256) return kAscii.letter[cp];
  return in_ranges(YABPE_LETTER_RANGES, YABPE_LETTER_RANGES_len, cp);
}
inline bool is_number(uint32_t cp) {
  if (cp < 256) return kAscii.number[cp];
  return in_ranges(YABPE_NUMBER_RANGES, YABPE_NUMBER_RANGES_len, cp);
}
inline bool is_space(uint32_t cp) {
  if (cp < 256) return kAscii.space[cp];
  return in_ranges(YABPE_SPACE_RANGES, YABPE_SPACE_RANGES_len, cp);
}

// Decode one UTF-8 codepoint at text[i]; assumes valid UTF-8. Returns the
// codepoint and writes the byte length to *len.
inline uint32_t decode(const uint8_t* text, int64_t i, int* len) {
  uint8_t b0 = text[i];
  if (b0 < 0x80) {
    *len = 1;
    return b0;
  }
  if (b0 < 0xE0) {
    *len = 2;
    return ((uint32_t)(b0 & 0x1F) << 6) | (text[i + 1] & 0x3F);
  }
  if (b0 < 0xF0) {
    *len = 3;
    return ((uint32_t)(b0 & 0x0F) << 12) | ((uint32_t)(text[i + 1] & 0x3F) << 6) |
           (text[i + 2] & 0x3F);
  }
  *len = 4;
  return ((uint32_t)(b0 & 0x07) << 18) | ((uint32_t)(text[i + 1] & 0x3F) << 12) |
         ((uint32_t)(text[i + 2] & 0x3F) << 6) | (text[i + 3] & 0x3F);
}

struct Special {
  const uint8_t* ptr;
  int32_t len;
};

// Parsed special-token list (no count limit; heap-backed). Callers pass a
// flat byte blob plus per-special lengths; `first_bytes` caches each
// special's first byte for the scan fast path.
struct SpecialSet {
  std::vector<Special> specials;
  std::vector<uint8_t> first_bytes;
  SpecialSet(const uint8_t* bytes, const int32_t* lens, int32_t n) {
    specials.resize(n > 0 ? n : 0);
    first_bytes.resize(n > 0 ? n : 0);
    int64_t off = 0;
    for (int32_t s = 0; s < n; ++s) {
      specials[s].ptr = bytes + off;
      specials[s].len = lens[s];
      first_bytes[s] = lens[s] > 0 ? bytes[off] : 0;
      off += lens[s];
    }
  }
};

// ---------------------------------------------------------------------------
// SIMD run skippers (AVX2): advance through runs of single-byte ASCII
// characters of one class 32 bytes at a time. Each returns the first
// index >= k whose byte is NOT an ASCII member of the class — any byte
// >= 0x80 fails the class test, so multi-byte UTF-8 always falls back to
// the exact scalar decoder. Builds without AVX2 keep the pure-scalar
// loops (the skippers degenerate to identity).
// ---------------------------------------------------------------------------
#if defined(__AVX2__)
#include <immintrin.h>

static inline int64_t skip_ascii_letters(const uint8_t* t, int64_t n,
                                         int64_t k) {
  const __m256i bit5 = _mm256_set1_epi8(0x20);
  const __m256i ca = _mm256_set1_epi8('a');
  const __m256i c25 = _mm256_set1_epi8(25);
  while (k + 32 <= n) {
    __m256i v = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(t + k));
    __m256i d = _mm256_sub_epi8(_mm256_or_si256(v, bit5), ca);
    __m256i ok = _mm256_cmpeq_epi8(_mm256_min_epu8(d, c25), d);
    uint32_t m = static_cast<uint32_t>(_mm256_movemask_epi8(ok));
    if (m != 0xFFFFFFFFu) return k + __builtin_ctz(~m);
    k += 32;
  }
  return k;
}

static inline int64_t skip_ascii_numbers(const uint8_t* t, int64_t n,
                                         int64_t k) {
  const __m256i c0 = _mm256_set1_epi8('0');
  const __m256i c9 = _mm256_set1_epi8(9);
  while (k + 32 <= n) {
    __m256i v = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(t + k));
    __m256i d = _mm256_sub_epi8(v, c0);
    __m256i ok = _mm256_cmpeq_epi8(_mm256_min_epu8(d, c9), d);
    uint32_t m = static_cast<uint32_t>(_mm256_movemask_epi8(ok));
    if (m != 0xFFFFFFFFu) return k + __builtin_ctz(~m);
    k += 32;
  }
  return k;
}

static inline __m256i ascii_space_mask(__m256i v) {
  // ASCII whitespace: {9, 10, 11, 12, 13, 32}
  const __m256i c9 = _mm256_set1_epi8(9);
  const __m256i c4 = _mm256_set1_epi8(4);
  const __m256i sp = _mm256_set1_epi8(' ');
  __m256i d = _mm256_sub_epi8(v, c9);
  __m256i ctl = _mm256_cmpeq_epi8(_mm256_min_epu8(d, c4), d);
  return _mm256_or_si256(ctl, _mm256_cmpeq_epi8(v, sp));
}

static inline int64_t skip_ascii_spaces(const uint8_t* t, int64_t n,
                                        int64_t k) {
  while (k + 32 <= n) {
    __m256i v = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(t + k));
    uint32_t m =
        static_cast<uint32_t>(_mm256_movemask_epi8(ascii_space_mask(v)));
    if (m != 0xFFFFFFFFu) return k + __builtin_ctz(~m);
    k += 32;
  }
  return k;
}

static inline int64_t skip_ascii_other(const uint8_t* t, int64_t n,
                                       int64_t k) {
  // ASCII bytes that are neither letters, numbers nor whitespace.
  const __m256i bit5 = _mm256_set1_epi8(0x20);
  const __m256i ca = _mm256_set1_epi8('a');
  const __m256i c25 = _mm256_set1_epi8(25);
  const __m256i c0 = _mm256_set1_epi8('0');
  const __m256i c9 = _mm256_set1_epi8(9);
  const __m256i hibit = _mm256_set1_epi8(static_cast<char>(0x80));
  const __m256i zero = _mm256_setzero_si256();
  while (k + 32 <= n) {
    __m256i v = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(t + k));
    __m256i dl = _mm256_sub_epi8(_mm256_or_si256(v, bit5), ca);
    __m256i isl = _mm256_cmpeq_epi8(_mm256_min_epu8(dl, c25), dl);
    __m256i dn = _mm256_sub_epi8(v, c0);
    __m256i isn = _mm256_cmpeq_epi8(_mm256_min_epu8(dn, c9), dn);
    __m256i iss = ascii_space_mask(v);
    __m256i ascii = _mm256_cmpeq_epi8(_mm256_and_si256(v, hibit), zero);
    __m256i bad = _mm256_or_si256(_mm256_or_si256(isl, isn), iss);
    __m256i ok = _mm256_andnot_si256(bad, ascii);
    uint32_t m = static_cast<uint32_t>(_mm256_movemask_epi8(ok));
    if (m != 0xFFFFFFFFu) return k + __builtin_ctz(~m);
    k += 32;
  }
  return k;
}
#else
static inline int64_t skip_ascii_letters(const uint8_t*, int64_t, int64_t k) {
  return k;
}
static inline int64_t skip_ascii_numbers(const uint8_t*, int64_t, int64_t k) {
  return k;
}
static inline int64_t skip_ascii_spaces(const uint8_t*, int64_t, int64_t k) {
  return k;
}
static inline int64_t skip_ascii_other(const uint8_t*, int64_t, int64_t k) {
  return k;
}
#endif

// One scanner step: token starting at byte offset i, returns its end offset.
// Specials are checked first, in the order given (trainer-dialect
// alternation order, trainer.py:163-169).
int64_t next_token_end(const uint8_t* text, int64_t n, int64_t i,
                       const Special* specials, int32_t n_specials) {
  for (int32_t s = 0; s < n_specials; ++s) {
    int32_t sl = specials[s].len;
    if (sl > 0 && i + sl <= n && memcmp(text + i, specials[s].ptr, sl) == 0) {
      return i + sl;
    }
  }

  int l0;
  uint32_t c0 = decode(text, i, &l0);

  // '(?:[sdmt]|ll|ve|re)
  if (c0 == '\'' && i + 1 < n) {
    uint8_t c1 = text[i + 1];
    if (c1 == 's' || c1 == 'd' || c1 == 'm' || c1 == 't') return i + 2;
    if (i + 2 < n) {
      uint8_t c2 = text[i + 2];
      if ((c1 == 'l' && c2 == 'l') || (c1 == 'v' && c2 == 'e') ||
          (c1 == 'r' && c2 == 'e')) {
        return i + 3;
      }
    }
  }

  //  ?\p{L}+ |  ?\p{N}+ |  ?[^\s\p{L}\p{N}]+   (optional leading U+0020)
  int64_t j = i;
  uint32_t cj = c0;
  int lj = l0;
  if (c0 == ' ' && i + 1 < n) {
    j = i + 1;
    cj = decode(text, j, &lj);
  }
  if (is_letter(cj)) {
    int64_t k = j + lj;
    while (k < n) {
      k = skip_ascii_letters(text, n, k);
      if (k >= n) break;
      int lk;
      uint32_t ck = decode(text, k, &lk);
      if (!is_letter(ck)) break;
      k += lk;
    }
    return k;
  }
  if (is_number(cj)) {
    int64_t k = j + lj;
    while (k < n) {
      k = skip_ascii_numbers(text, n, k);
      if (k >= n) break;
      int lk;
      uint32_t ck = decode(text, k, &lk);
      if (!is_number(ck)) break;
      k += lk;
    }
    return k;
  }
  if (!is_space(cj)) {
    int64_t k = j + lj;
    while (k < n) {
      k = skip_ascii_other(text, n, k);
      if (k >= n) break;
      int lk;
      uint32_t ck = decode(text, k, &lk);
      if (is_space(ck) || is_letter(ck) || is_number(ck)) break;
      k += lk;
    }
    return k;
  }

  // Whitespace run from i. \s+(?!\S) leaves the final whitespace char for
  // the next token when a non-space follows; \s+ covers the 1-char case.
  int64_t k = i;
  int64_t last_start = i;  // start offset of the final whitespace char seen
  int64_t ws_chars = 0;
  while (k < n) {
    int64_t k2 = skip_ascii_spaces(text, n, k);
    if (k2 > k) {
      // ASCII whitespace is one byte per char
      ws_chars += k2 - k;
      last_start = k2 - 1;
      k = k2;
      if (k >= n) break;
    }
    int lk;
    uint32_t ck = decode(text, k, &lk);
    if (!is_space(ck)) break;
    last_start = k;
    ++ws_chars;
    k += lk;
  }
  if (k >= n) return k;               // \s+(?!\S) at end of text
  if (ws_chars >= 2) return last_start;  // \s+(?!\S) minus the last char
  return k;                           // single whitespace via \s+
}

// ---------------------------------------------------------------------------
// Word-frequency counter: open-addressing hash map (FNV-1a) with an arena
// for word bytes, insertion-ordered entries for deterministic export.
// ---------------------------------------------------------------------------

// One open-addressing slot: 64 bytes, one per cache line, with the count
// stored INLINE. Word identity is held inline too: w8/w16 are injective
// packings of the first/second 8 bytes given len (see pack_word8), so
// words of <= 16 bytes never touch the arena on lookup; longer words
// memcmp their tail. len == 0 marks empty. The inline count makes the
// counting hot path (existing word) a single prefetchable random access —
// an earlier 32-byte-slot layout kept counts in a separate order-indexed
// array, but `counts[slot.order] += 1` was a second, DEPENDENT random
// access that no batch prefetch could cover (measured as the residual
// latency term of ingest counting).
struct alignas(64) Slot {
  uint64_t w8;
  uint64_t w16;
  int64_t count;
  uint32_t offset_lo;  // arena offset (split: keeps fields naturally packed)
  uint32_t len;
  uint32_t order;  // insertion index (export order, word_ids id)
  uint32_t offset_hi;
};

inline int64_t slot_offset(const Slot& sl) {
  return (int64_t)(((uint64_t)sl.offset_hi << 32) | sl.offset_lo);
}

struct Counter {
  Slot* slots = nullptr;
  size_t cap = 0;  // power of two
  std::vector<uint32_t> order_to_slot;
  uint8_t* arena = nullptr;
  size_t arena_len = 0;
  size_t arena_cap = 0;

  size_t n_entries() const { return order_to_slot.size(); }

  ~Counter() {
    free(slots);
    free(arena);
  }
};

inline uint64_t mix64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdull;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ull;
  x ^= x >> 33;
  return x;
}

// Pack a word's identity into 8 bytes. For len <= 8 the packing is
// INJECTIVE given len (wyhash-style overlapping reads: the chosen byte
// positions cover every index), so (len, w8) equality IS byte equality and
// the hot probe never touches the arena. For len > 8 it's the first 8
// bytes; the tail is memcmp'd.
inline uint64_t pack_word8(const uint8_t* p, int32_t len) {
  if (len >= 8) {
    uint64_t v;
    memcpy(&v, p, 8);
    return v;
  }
  if (len >= 4) {
    uint32_t a, b;
    memcpy(&a, p, 4);
    memcpy(&b, p + len - 4, 4);
    return (uint64_t)a | ((uint64_t)b << 32);
  }
  // len 1..3: positions 0, len/2, len-1 cover all bytes
  return (uint64_t)p[0] | ((uint64_t)p[len >> 1] << 8) |
         ((uint64_t)p[len - 1] << 16);
}

inline uint64_t pack_w16(const uint8_t* p, int32_t len) {
  if (len <= 8) return 0;
  if (len >= 16) {
    uint64_t v;
    memcpy(&v, p + 8, 8);
    return v;
  }
  return pack_word8(p + 8, len - 8);
}

// Hash over the full word: tail below points at word+16 (only read when
// len > 16).
inline uint64_t hash_wkey(uint64_t w8, uint64_t w16, const uint8_t* tail,
                          int32_t len) {
  uint64_t h = w8 ^ ((uint64_t)(uint32_t)len * 0x9E3779B97F4A7C15ull);
  if (len > 8) h = mix64(h ^ w16);
  for (int32_t i = 16; i < len; i += 8) {
    int32_t nb = len - i < 8 ? len - i : 8;
    uint64_t block = 0;
    memcpy(&block, tail + (i - 16), (size_t)nb);
    h = mix64(h ^ block);
  }
  return mix64(h);
}

Slot* alloc_slots(size_t cap) {
  size_t bytes = cap * sizeof(Slot);
  Slot* p = (Slot*)aligned_alloc(64, bytes);
  if (!p) {
    fprintf(stderr, "yabpe_native: slot table allocation of %zu bytes failed\n",
            bytes);
    abort();  // fail cleanly instead of segfaulting in the memset below
  }
#ifdef __linux__
  // Fault via huge pages where possible: ~10x cheaper first touch on
  // lazily-provisioned hosts (see yabpe_tpu.utils.hostmem).
  if (bytes >= (2u << 20)) madvise(p, bytes, MADV_HUGEPAGE);
#endif
  memset(p, 0, bytes);
  return p;
}

void counter_grow(Counter* c) {
  size_t ncap = c->cap ? c->cap * 2 : 1 << 16;
  Slot* nslots = alloc_slots(ncap);
  for (size_t i = 0; i < c->cap; ++i) {
    Slot& sl = c->slots[i];
    if (!sl.len) continue;
    uint64_t h = hash_wkey(sl.w8, sl.w16, c->arena + slot_offset(sl) + 16,
                           (int32_t)sl.len);
    size_t j = h & (ncap - 1);
    while (nslots[j].len) j = (j + 1) & (ncap - 1);
    nslots[j] = sl;
    c->order_to_slot[sl.order] = (uint32_t)j;
  }
  free(c->slots);
  c->slots = nslots;
  c->cap = ncap;
}

// Find-or-insert with precomputed identity/hash; returns the insertion
// order id.
int64_t counter_upsert(Counter* c, const uint8_t* word, int32_t len,
                       int64_t count, uint64_t w8, uint64_t w16,
                       uint64_t h) {
  if ((c->n_entries() + 1) * 2 > c->cap) counter_grow(c);
  size_t s = h & (c->cap - 1);
  while (c->slots[s].len) {
    Slot& sl = c->slots[s];
    if (sl.len == (uint32_t)len && sl.w8 == w8 && sl.w16 == w16 &&
        (len <= 16 ||
         memcmp(c->arena + slot_offset(sl) + 16, word + 16,
                (size_t)(len - 16)) == 0)) {
      sl.count += count;
      return (int64_t)sl.order;
    }
    s = (s + 1) & (c->cap - 1);
  }
  if (c->arena_len + (size_t)len > c->arena_cap) {
    size_t ncap = c->arena_cap ? c->arena_cap * 2 : 1 << 20;
    while (ncap < c->arena_len + (size_t)len) ncap *= 2;
    uint8_t* na = (uint8_t*)realloc(c->arena, ncap);
    if (!na) {
      fprintf(stderr,
              "yabpe_native: word arena growth to %zu bytes failed\n", ncap);
      abort();
    }
    c->arena = na;
    c->arena_cap = ncap;
  }
  memcpy(c->arena + c->arena_len, word, len);
  Slot& sl = c->slots[s];
  sl.w8 = w8;
  sl.w16 = w16;
  sl.count = count;
  sl.offset_lo = (uint32_t)(c->arena_len & 0xFFFFFFFFu);
  sl.offset_hi = (uint32_t)(c->arena_len >> 32);
  sl.len = (uint32_t)len;
  sl.order = (uint32_t)c->order_to_slot.size();
  c->arena_len += (size_t)len;
  c->order_to_slot.push_back((uint32_t)s);
  return (int64_t)sl.order;
}

// Returns the entry index of the word (inserting it if new).
int64_t counter_add_word(Counter* c, const uint8_t* word, int32_t len,
                         int64_t count) {
  uint64_t w8 = pack_word8(word, len);
  uint64_t w16 = pack_w16(word, len);
  uint64_t h = hash_wkey(w8, w16, word + 16, len);
  return counter_upsert(c, word, len, count, w8, w16, h);
}

// Batched scan+count: pre-tokenize `text`, computing identities and
// prefetching each token's first probe slot a batch ahead so the table
// misses overlap (memory-level parallelism — the tail of a large unique
// set is DRAM-latency-bound, ~134 ns/access on this host when chased
// serially). Writes per-occurrence order ids when out_ids != nullptr
// (id_base + running count indexes out_ids); returns the token count.
constexpr int kScanBatch = 32;

int64_t batch_scan_count(Counter* c, const uint8_t* text, int64_t n,
                         const Special* specials, int32_t n_specials,
                         int32_t* out_ids, int64_t cap, int64_t id_base) {
  struct Pend {
    int64_t start;
    int32_t len;
    uint64_t w8, w16, h;
  };
  Pend pend[kScanBatch];
  int64_t i = 0, count = 0;
  while (i < n) {
    int nb = 0;
    size_t mask = c->cap ? c->cap - 1 : 0;
    while (nb < kScanBatch && i < n) {
      int64_t e = next_token_end(text, n, i, specials, n_specials);
      Pend& t = pend[nb++];
      t.start = i;
      t.len = (int32_t)(e - i);
      const uint8_t* p = text + i;
      t.w8 = pack_word8(p, t.len);
      t.w16 = pack_w16(p, t.len);
      t.h = hash_wkey(t.w8, t.w16, p + 16, t.len);
      if (c->slots) __builtin_prefetch(&c->slots[t.h & mask]);
      i = e;
    }
    for (int k = 0; k < nb; ++k) {
      const Pend& t = pend[k];
      int64_t id = counter_upsert(c, text + t.start, t.len, 1, t.w8, t.w16,
                                  t.h);
      int64_t pos = id_base + count;
      if (pos < cap && out_ids) out_ids[pos] = (int32_t)id;
      ++count;
    }
  }
  return count;
}

}  // namespace

extern "C" {

// Validate UTF-8 (same acceptance as CPython's strict decoder: rejects
// continuation/lead errors, overlongs, surrogates, > U+10FFFF, truncation).
// Returns -1 when valid, else the byte offset of the first invalid byte.
// Lets the ingest path validate without the GIL (reference raises a
// positioned ValueError, trainer.py:155-160 — the Python layer re-raises
// via str.decode at the reported offset for message parity).
int64_t yabpe_utf8_validate(const uint8_t* text, int64_t n) {
  int64_t i = 0;
  while (i < n) {
    uint8_t b0 = text[i];
    if (b0 < 0x80) {
      ++i;
      continue;
    }
    int need;
    uint8_t lo = 0x80, hi = 0xBF;
    if (b0 >= 0xC2 && b0 <= 0xDF) {
      need = 1;
    } else if (b0 == 0xE0) {
      need = 2;
      lo = 0xA0;
    } else if (b0 >= 0xE1 && b0 <= 0xEC) {
      need = 2;
    } else if (b0 == 0xED) {
      need = 2;
      hi = 0x9F;  // exclude surrogates
    } else if (b0 >= 0xEE && b0 <= 0xEF) {
      need = 2;
    } else if (b0 == 0xF0) {
      need = 3;
      lo = 0x90;
    } else if (b0 >= 0xF1 && b0 <= 0xF3) {
      need = 3;
    } else if (b0 == 0xF4) {
      need = 3;
      hi = 0x8F;
    } else {
      return i;
    }
    if (i + need >= n) return i;  // truncated at end of buffer
    // first continuation byte has the restricted range
    uint8_t c1 = text[i + 1];
    if (c1 < lo || c1 > hi) return i;
    for (int k = 2; k <= need; ++k) {
      uint8_t ck = text[i + k];
      if (ck < 0x80 || ck > 0xBF) return i;
    }
    i += need + 1;
  }
  return -1;
}

// Encode path: fill `ends` with token end byte-offsets (no specials — the
// tokenizer splits on specials beforehand, tokenizer.py:88-104 dialect).
// Returns the total number of tokens; only min(total, cap) entries are
// written, so callers can size-probe with cap=0.
int64_t yabpe_pretok_offsets(const uint8_t* text, int64_t n, int32_t* ends,
                             int64_t cap) {
  int64_t i = 0, count = 0;
  while (i < n) {
    int64_t e = next_token_end(text, n, i, nullptr, 0);
    if (count < cap) ends[count] = (int32_t)e;
    ++count;
    i = e;
  }
  return count;
}

// Encode path, deduplicating variant: pre-tokenize (no specials) while
// registering each token in `counter` and writing its unique-word id per
// occurrence. The caller reconstructs the id stream with one vectorized
// gather over the per-unique-word encodings. Returns the occurrence count;
// only min(count, cap) ids are written.
int64_t yabpe_pretok_word_ids(void* h, const uint8_t* text, int64_t n,
                              int32_t* out_ids, int64_t cap) {
  Counter* c = (Counter*)h;
  return batch_scan_count(c, text, n, nullptr, 0, out_ids, cap, 0);
}

// Combined tokenizer-dialect pass: split on specials (caller passes them
// SORTED LONGEST-FIRST, matching the reference's split pattern,
// tokenizer.py:100-102), pre-tokenize each plain segment as its own
// bounded buffer (so regex lookahead semantics at segment ends match the
// reference's per-part findall, tokenizer.py:171-190), registering each
// pre-token in `counter`. Emits one id per element: unique-word id for a
// pre-token, -(1+special_index) for a special occurrence. Returns the
// element count; only min(count, cap) ids are written.
int64_t yabpe_pretok_word_ids_specials(void* h, const uint8_t* text,
                                       int64_t n,
                                       const uint8_t* special_bytes,
                                       const int32_t* special_lens,
                                       int32_t n_specials, int32_t* out_ids,
                                       int64_t cap) {
  Counter* c = (Counter*)h;
  SpecialSet sp_set(special_bytes, special_lens, n_specials);
  const Special* specials = sp_set.specials.data();
  const uint8_t* first_bytes = sp_set.first_bytes.data();
  int64_t count = 0;
  int64_t seg_start = 0;
  int64_t i = 0;
  while (i <= n) {
    int32_t hit = -1;
    if (i < n) {
      uint8_t ch = text[i];
      for (int32_t s = 0; s < n_specials; ++s) {
        int32_t sl = specials[s].len;
        if (sl > 0 && ch == first_bytes[s] && i + sl <= n &&
            memcmp(text + i, specials[s].ptr, sl) == 0) {
          hit = s;
          break;
        }
      }
      if (hit < 0) {
        ++i;
        continue;
      }
    }
    // Flush the plain segment [seg_start, i) with end-of-buffer semantics.
    count += batch_scan_count(c, text + seg_start, i - seg_start, nullptr, 0,
                              out_ids, cap, count);
    if (i >= n) break;
    if (count < cap) out_ids[count] = -(1 + hit);
    ++count;
    i += specials[hit].len;
    seg_start = i;
  }
  return count;
}

// Tokenizer-dialect special-token scan: find non-overlapping special
// occurrences left-to-right; the caller passes specials SORTED
// LONGEST-FIRST so the longest alternative wins at each position (mirrors
// the reference's split pattern, tokenizer.py:100-102). Returns the number
// of occurrences; writes (start offset, special index) pairs.
int64_t yabpe_find_specials(const uint8_t* text, int64_t n,
                            const uint8_t* special_bytes,
                            const int32_t* special_lens, int32_t n_specials,
                            int64_t* starts, int32_t* ids, int64_t cap) {
  SpecialSet sp_set(special_bytes, special_lens, n_specials);
  const Special* specials = sp_set.specials.data();
  const uint8_t* first_bytes = sp_set.first_bytes.data();
  int64_t count = 0;
  int64_t i = 0;
  while (i < n) {
    bool matched = false;
    uint8_t c = text[i];
    for (int32_t s = 0; s < n_specials; ++s) {
      int32_t sl = specials[s].len;
      if (sl > 0 && c == first_bytes[s] && i + sl <= n &&
          memcmp(text + i, specials[s].ptr, sl) == 0) {
        if (count < cap) {
          starts[count] = i;
          ids[count] = s;
        }
        ++count;
        i += sl;
        matched = true;
        break;
      }
    }
    if (!matched) ++i;
  }
  return count;
}

void* yabpe_counter_new(void) { return new Counter(); }

void yabpe_counter_free(void* h) { delete (Counter*)h; }

// Pre-tokenize text (trainer dialect: specials as top-priority alternates in
// config order) and accumulate word frequencies.
void yabpe_counter_add(void* h, const uint8_t* text, int64_t n,
                       const uint8_t* special_bytes,
                       const int32_t* special_lens, int32_t n_specials) {
  Counter* c = (Counter*)h;
  SpecialSet sp_set(special_bytes, special_lens, n_specials);
  const Special* specials = sp_set.specials.data();
  batch_scan_count(c, text, n, specials, n_specials, nullptr, 0, 0);
}

// Add a raw exported word table (blob + lens + counts) into the counter —
// the cross-host union step: hosts exchange raw tables (host-count
// invariant by commutativity) and every host folds the others' tables in.
// Prefetch-batched like counter_merge.
void yabpe_counter_add_table(void* h, const uint8_t* blob,
                             const int32_t* lens, const int64_t* counts,
                             int64_t n_words) {
  Counter* c = (Counter*)h;
  constexpr int B = kScanBatch;
  struct Pend {
    const uint8_t* p;
    int32_t len;
    int64_t count;
    uint64_t w8, w16, hsh;
  };
  Pend pend[B];
  int64_t off = 0, i = 0;
  while (i < n_words) {
    int nb = 0;
    size_t mask = c->cap ? c->cap - 1 : 0;
    while (nb < B && i < n_words) {
      if (lens[i] <= 0) {
        // A malformed exchanged table entry: pack_word8 would read out of
        // bounds and a 0-length slot would alias the empty marker. Skip.
        ++i;
        continue;
      }
      Pend& t = pend[nb++];
      t.p = blob + off;
      t.len = lens[i];
      t.count = counts[i];
      t.w8 = pack_word8(t.p, t.len);
      t.w16 = pack_w16(t.p, t.len);
      t.hsh = hash_wkey(t.w8, t.w16, t.p + 16, t.len);
      if (c->slots) __builtin_prefetch(&c->slots[t.hsh & mask]);
      off += lens[i];
      ++i;
    }
    for (int k = 0; k < nb; ++k) {
      const Pend& t = pend[k];
      counter_upsert(c, t.p, t.len, t.count, t.w8, t.w16, t.hsh);
    }
  }
}

// Merge src into dst (src unchanged). Lets the driver fold per-chunk
// counters without exporting intermediates.
void yabpe_counter_merge(void* dst, const void* src) {
  Counter* d = (Counter*)dst;
  const Counter* s = (const Counter*)src;
  // Prefetch destination probe slots a batch ahead (same MLP rationale as
  // batch_scan_count); identities/hashes are already in src slots.
  constexpr int B = kScanBatch;
  const Slot* pend[B];
  uint64_t hs[B];
  size_t total = s->n_entries();
  for (size_t base = 0; base < total; base += B) {
    size_t nb = total - base < (size_t)B ? total - base : (size_t)B;
    size_t mask = d->cap ? d->cap - 1 : 0;
    for (size_t k = 0; k < nb; ++k) {
      const Slot& sl = s->slots[s->order_to_slot[base + k]];
      pend[k] = &sl;
      hs[k] = hash_wkey(sl.w8, sl.w16, s->arena + slot_offset(sl) + 16,
                        (int32_t)sl.len);
      if (d->slots) __builtin_prefetch(&d->slots[hs[k] & mask]);
    }
    for (size_t k = 0; k < nb; ++k) {
      const Slot& sl = *pend[k];
      counter_upsert(d, s->arena + slot_offset(sl), (int32_t)sl.len,
                     sl.count, sl.w8, sl.w16, hs[k]);
    }
  }
}

int64_t yabpe_counter_unique(const void* h) {
  return (int64_t)((const Counter*)h)->n_entries();
}

int64_t yabpe_counter_total_bytes(const void* h) {
  return (int64_t)((const Counter*)h)->arena_len;
}

// Export in insertion (first-occurrence) order: concatenated word bytes,
// per-word byte lengths, per-word counts. Buffers must be sized from
// yabpe_counter_total_bytes / yabpe_counter_unique.
void yabpe_counter_export(const void* h, uint8_t* words, int32_t* lens,
                          int64_t* counts) {
  const Counter* c = (const Counter*)h;
  memcpy(words, c->arena, c->arena_len);
  for (size_t e = 0; e < c->n_entries(); ++e) {
    const Slot& sl = c->slots[c->order_to_slot[e]];
    lens[e] = (int32_t)sl.len;
    counts[e] = sl.count;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host word encoder: the tokenizer's per-word BPE loop in C.
//
// Batch-merge formulation (provably equivalent to the reference's
// one-occurrence-at-a-time heap, tokenizer.py:195-308 — see
// yabpe_tpu.tok.tokenizer module doc): repeatedly find the lowest-rank
// adjacent pair present in the word, merge every leftmost-non-overlapping
// occurrence, repeat. Works in the extended-symbol space built by the
// Python layer (256 byte symbols + live merge products), with an internal
// word cache so repeated pre-tokens cost one hash probe.
// ---------------------------------------------------------------------------

namespace {

inline uint64_t pkey(int32_t l, int32_t r) {
  return ((uint64_t)(uint32_t)l << 32) | (uint32_t)r;
}

struct EncEntry {
  int32_t rank;
  int32_t new_sym;
};

struct Encoder {
  std::unordered_map<uint64_t, EncEntry> live;  // (l<<32|r) -> rank,new_sym
  std::vector<int32_t> out_ids;                 // sym -> vocab id
  // Word cache on the Counter's flat identity table: word -> dense order
  // id (one prefetchable probe per occurrence), encodings appended once
  // per unique word to a flat id pool indexed by order.
  Counter words;
  std::vector<int64_t> enc_off;   // order -> enc_flat start; size n+1
  std::vector<int32_t> enc_flat;  // concatenated per-word vocab ids
  int64_t hits = 0;
  int64_t misses = 0;
  std::vector<int32_t> syms;  // scratch
  // ctypes releases the GIL, so concurrent encode() calls from Python
  // threads reach this object in parallel.
  std::mutex mu;
};

// BPE-encode one pre-token's bytes into e.syms (lowest-rank pair, all
// leftmost-non-overlapping occurrences per iteration — equivalent to the
// reference's heap loop, see yabpe_tpu.tok.tokenizer module docs).
void bpe_word(Encoder& e, const uint8_t* w, int32_t len) {
  std::vector<int32_t>& syms = e.syms;
  syms.clear();
  for (int32_t i = 0; i < len; ++i) syms.push_back(w[i]);
  while (syms.size() > 1) {
    int32_t best_rank = INT32_MAX;
    uint64_t best_key = 0;
    int32_t best_new = -1;
    for (size_t j = 0; j + 1 < syms.size(); ++j) {
      auto pit = e.live.find(pkey(syms[j], syms[j + 1]));
      if (pit != e.live.end() && pit->second.rank < best_rank) {
        best_rank = pit->second.rank;
        best_key = pkey(syms[j], syms[j + 1]);
        best_new = pit->second.new_sym;
      }
    }
    if (best_new < 0) break;
    int32_t a = (int32_t)(best_key >> 32), b = (int32_t)(best_key & 0xFFFFFFFF);
    size_t k = 0, j = 0;
    while (j < syms.size()) {
      if (j + 1 < syms.size() && syms[j] == a && syms[j + 1] == b) {
        syms[k++] = best_new;
        j += 2;
      } else {
        syms[k++] = syms[j++];
      }
    }
    syms.resize(k);
  }
}

// Compute and pool the encoding for the word with dense id `order` (must
// be the next unpooled order).
void encode_new_word(Encoder& e, int64_t order) {
  const Slot& sl = e.words.slots[e.words.order_to_slot[(size_t)order]];
  bpe_word(e, e.words.arena + slot_offset(sl), (int32_t)sl.len);
  for (int32_t sym : e.syms) {
    e.enc_flat.push_back(e.out_ids[(size_t)sym]);
  }
  e.enc_off.push_back((int64_t)e.enc_flat.size());
  ++e.misses;
}

// Batched pretok + cache-probe + emit over one special-free segment
// (same MLP batching rationale as batch_scan_count).
int64_t encode_seg_batched(Encoder& e, const uint8_t* seg, int64_t seg_len,
                           int32_t* out, int64_t cap, int64_t written) {
  struct Pend {
    int64_t start;
    int32_t len;
    uint64_t w8, w16, h;
  };
  Pend pend[kScanBatch];
  Counter* c = &e.words;
  int64_t i = 0;
  while (i < seg_len) {
    int nb = 0;
    size_t mask = c->cap ? c->cap - 1 : 0;
    while (nb < kScanBatch && i < seg_len) {
      int64_t end = next_token_end(seg, seg_len, i, nullptr, 0);
      Pend& t = pend[nb++];
      t.start = i;
      t.len = (int32_t)(end - i);
      const uint8_t* p = seg + i;
      t.w8 = pack_word8(p, t.len);
      t.w16 = pack_w16(p, t.len);
      t.h = hash_wkey(t.w8, t.w16, p + 16, t.len);
      if (c->slots) __builtin_prefetch(&c->slots[t.h & mask]);
      i = end;
    }
    for (int k = 0; k < nb; ++k) {
      const Pend& t = pend[k];
      int64_t id = counter_upsert(c, seg + t.start, t.len, 1, t.w8, t.w16,
                                  t.h);
      if ((size_t)id + 1 >= e.enc_off.size()) {
        encode_new_word(e, id);
      } else {
        ++e.hits;
      }
      int64_t b = e.enc_off[(size_t)id], f = e.enc_off[(size_t)id + 1];
      for (int64_t x = b; x < f; ++x) {
        if (written < cap) out[written] = e.enc_flat[(size_t)x];
        ++written;
      }
    }
  }
  return written;
}

}  // namespace

extern "C" {

// Build an encoder from the extended-symbol formulation: live merge table
// (pair key, rank, product symbol) + per-symbol output vocab ids.
void* yabpe_encoder_new(const uint64_t* pair_keys, const int32_t* pair_ranks,
                        const int32_t* pair_new_syms, int64_t n_pairs,
                        const int32_t* out_ids, int32_t n_syms) {
  Encoder* e = new Encoder();
  e->live.reserve((size_t)n_pairs * 2);
  for (int64_t i = 0; i < n_pairs; ++i) {
    e->live[pair_keys[i]] = {pair_ranks[i], pair_new_syms[i]};
  }
  e->out_ids.assign(out_ids, out_ids + n_syms);
  e->enc_off.push_back(0);
  return e;
}

void yabpe_encoder_free(void* h) { delete (Encoder*)h; }

// Pre-tokenize a special-free UTF-8 segment and encode every pre-token.
// Writes vocab ids to out (cap must be >= n: one id per byte suffices).
int64_t yabpe_encode_segment(void* h, const uint8_t* text, int64_t n,
                             int32_t* out, int64_t cap) {
  Encoder* e = (Encoder*)h;
  std::lock_guard<std::mutex> lock(e->mu);
  return encode_seg_batched(*e, text, n, out, cap, 0);
}

// Whole-text encode: split on specials (SORTED LONGEST-FIRST, tokenizer
// dialect) and BPE-encode every plain segment, writing vocab ids in one
// output array. special_ids[s] is the vocab id emitted for special s, or
// -1 to drop it (the reference drops specials missing from the vocab,
// tokenizer.py:177-181). Returns the id count; writes min(count, cap).
int64_t yabpe_encode_text(void* h, const uint8_t* text, int64_t n,
                          const uint8_t* special_bytes,
                          const int32_t* special_lens,
                          const int32_t* special_ids, int32_t n_specials,
                          int32_t* out, int64_t cap) {
  Encoder* e = (Encoder*)h;
  std::lock_guard<std::mutex> lock(e->mu);
  SpecialSet sp_set(special_bytes, special_lens, n_specials);
  const Special* specials = sp_set.specials.data();
  const uint8_t* first_bytes = sp_set.first_bytes.data();
  int64_t written = 0;
  auto encode_seg = [&](const uint8_t* seg, int64_t seg_len) {
    written = encode_seg_batched(*e, seg, seg_len, out, cap, written);
  };
  int64_t seg_start = 0;
  int64_t i = 0;
  while (i <= n) {
    int32_t hit = -1;
    if (i < n) {
      uint8_t ch = text[i];
      for (int32_t s = 0; s < n_specials; ++s) {
        int32_t sl = specials[s].len;
        if (sl > 0 && ch == first_bytes[s] && i + sl <= n &&
            memcmp(text + i, specials[s].ptr, sl) == 0) {
          hit = s;
          break;
        }
      }
      if (hit < 0) {
        ++i;
        continue;
      }
    }
    encode_seg(text + seg_start, i - seg_start);
    if (i >= n) break;
    if (special_ids[hit] >= 0) {
      if (written < cap) out[written] = special_ids[hit];
      ++written;
    }
    i += specials[hit].len;
    seg_start = i;
  }
  return written;
}

void yabpe_encoder_cache_info(void* h, int64_t* hits, int64_t* misses,
                              int64_t* size) {
  Encoder* e = (Encoder*)h;
  std::lock_guard<std::mutex> lock(e->mu);
  *hits = e->hits;
  *misses = e->misses;
  *size = (int64_t)e->words.n_entries();
}

void yabpe_encoder_cache_clear(void* h) {
  Encoder* e = (Encoder*)h;
  std::lock_guard<std::mutex> lock(e->mu);
  free(e->words.slots);
  free(e->words.arena);
  e->words = Counter();
  e->enc_off.assign(1, 0);
  e->enc_flat.clear();
  e->hits = 0;
  e->misses = 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host BPE merge loop for small workloads.
//
// Behavioral parity target: the reference's training merge loop
// (/root/reference/src/yet_another_bpe/trainer.py:216-302): per iteration,
// argmax over pair counts with ties broken by the lexicographically
// GREATEST (left_bytes, right_bytes) tuple; stop when the best count drops
// below min_frequency; apply the merge leftmost-to-right within each
// affected word; merged bytes already present in the vocabulary reuse that
// token (dedup branch, trainer.py:298-300). The device (XLA) path owns
// large workloads; this native loop exists because a few hundred merges on
// a ~100 KB corpus are latency-bound, not throughput-bound. Results are
// bit-identical across both paths (tested).
// ---------------------------------------------------------------------------

namespace {

// Candidate word indices live inline until they overflow into `spill`:
// Zipf-tailed pair tables have mostly-rare pairs, so the inline slots
// absorb the bulk of what used to be one heap allocation per pair (plus
// a dependent pointer chase on every dedup check). kInline is chosen so
// the struct fills its 64-byte line exactly.
struct PairRec {
  static constexpr int kInline = 6;
  int64_t count = 0;
  int32_t gen = -1;   // last merge iteration this pair was touched
  int32_t n_inl = 0;  // used entries of inl[]
  int32_t inl[kInline] = {};
  std::vector<int32_t> spill;  // overflow candidates (may be stale)

  inline int32_t last_word() const {
    if (!spill.empty()) return spill.back();
    return n_inl ? inl[n_inl - 1] : -1;
  }
  // Append wi unless it is already the most recent candidate (pushes for
  // one word are contiguous, so dedup-by-last suffices).
  inline void add_word(int32_t wi) {
    if (last_word() == wi) return;
    if (n_inl < kInline) {
      inl[n_inl++] = wi;
    } else {
      spill.push_back(wi);
    }
  }
};

struct HeapEntry {
  int64_t count;
  uint64_t key;
};

// Open-addressing (linear probe, tombstoned) map keyed by packed pair ids.
// std::unordered_map's node-based buckets were ~1/3 of training time
// (gprof); pair keys are dense random uint64s so a flat table with a
// splitmix64 hash probes ~1 slot on average at load <= 0.5. Sentinel keys
// are unreachable: real keys pack two symbol ids < 2^31.
struct PairMap {
  static constexpr uint64_t EMPTY = ~0ull;
  static constexpr uint64_t TOMB = ~0ull - 1;
  std::vector<uint64_t> keys;
  std::vector<PairRec> vals;
  size_t mask = 0;
  size_t n_live = 0;
  size_t n_used = 0;  // live + tombstones

  static inline size_t hashk(uint64_t k) {
    k += 0x9e3779b97f4a7c15ull;
    k = (k ^ (k >> 30)) * 0xbf58476d1ce4e5b9ull;
    k = (k ^ (k >> 27)) * 0x94d049bb133111ebull;
    return (size_t)(k ^ (k >> 31));
  }

  void reset(size_t cap_hint) {
    size_t cap = 64;
    while (cap < cap_hint * 2) cap <<= 1;
    keys.assign(cap, EMPTY);
    vals.clear();
    vals.resize(cap);
    mask = cap - 1;
    n_live = n_used = 0;
  }

  PairRec* find(uint64_t k) {
    size_t i = hashk(k) & mask;
    while (true) {
      uint64_t kk = keys[i];
      if (kk == k) return &vals[i];
      if (kk == EMPTY) return nullptr;
      i = (i + 1) & mask;
    }
  }

  PairRec& get_or_insert(uint64_t k) {
    if ((n_used + 1) * 2 > keys.size()) rehash();
    size_t i = hashk(k) & mask;
    size_t tomb = SIZE_MAX;
    while (true) {
      uint64_t kk = keys[i];
      if (kk == k) return vals[i];
      if (kk == EMPTY) {
        if (tomb != SIZE_MAX) {
          i = tomb;  // reuse the first tombstone on the probe path
        } else {
          ++n_used;
        }
        keys[i] = k;
        ++n_live;
        vals[i] = PairRec{};
        return vals[i];
      }
      if (kk == TOMB && tomb == SIZE_MAX) tomb = i;
      i = (i + 1) & mask;
    }
  }

  void erase(uint64_t k) {
    size_t i = hashk(k) & mask;
    while (true) {
      uint64_t kk = keys[i];
      if (kk == k) {
        keys[i] = TOMB;
        vals[i] = PairRec{};  // free the words vector
        --n_live;
        return;
      }
      if (kk == EMPTY) return;
      i = (i + 1) & mask;
    }
  }

  void rehash() {
    std::vector<uint64_t> old_keys;
    std::vector<PairRec> old_vals;
    old_keys.swap(keys);
    old_vals.swap(vals);
    size_t cap = old_keys.size();
    if (n_live * 4 > cap) cap <<= 1;  // grow only when genuinely full
    keys.assign(cap, EMPTY);
    vals.clear();
    vals.resize(cap);
    mask = cap - 1;
    n_used = n_live;
    for (size_t j = 0; j < old_keys.size(); ++j) {
      uint64_t k = old_keys[j];
      if (k == EMPTY || k == TOMB) continue;
      size_t i = hashk(k) & mask;
      while (keys[i] != EMPTY) i = (i + 1) & mask;
      keys[i] = k;
      vals[i] = std::move(old_vals[j]);
    }
  }

  template <typename F>
  void for_each(F f) const {
    for (size_t i = 0; i < keys.size(); ++i) {
      if (keys[i] != EMPTY && keys[i] != TOMB) f(keys[i], vals[i]);
    }
  }
};

struct Trainer {
  std::vector<std::string> sym_bytes;   // symbol id -> bytes
  // Big-endian zero-padded first-8-bytes key per symbol: prefix compare
  // decides most lexicographic comparisons in one integer op; equal
  // prefixes fall back to the full byte compare.
  std::vector<uint64_t> sym_prefix;
  std::unordered_map<std::string, int32_t> sym_of;
  // Word symbol rows in one arena (offset/len per word): merges only
  // shrink rows in place, and contiguity + prefetch keeps the per-merge
  // affected-word scans off the DRAM-latency path.
  std::vector<int32_t> word_data;
  std::vector<int64_t> word_off;
  std::vector<int32_t> word_len;
  std::vector<int64_t> counts;
  PairMap pairs;
  std::vector<std::array<int32_t, 2>> merges;  // (left_sym, right_sym)
  // Lazy max-heap over (count, lex-greatest pair); entries go stale when a
  // pair's count changes and are dropped on pop (validity = count match).
  // THRESHOLDED: only pairs with count >= heap_min are pushed, which keeps
  // the heap cache-sized (a full heap over millions of pairs is
  // DRAM-latency-bound: ~1.3us per sift measured). Every live pair whose
  // count is or becomes >= heap_min has a current entry, so the valid top
  // is the exact global argmax; when the heap runs dry, it is rebuilt from
  // the pair map with a lower threshold.
  std::vector<HeapEntry> heap;
  int64_t heap_min = 1;
};

uint64_t prefix_key(const std::string& s) {
  uint64_t p = 0;
  size_t n = s.size() < 8 ? s.size() : 8;
  for (size_t i = 0; i < n; ++i) {
    p |= (uint64_t)(uint8_t)s[i] << (8 * (7 - i));
  }
  return p;
}

// bytewise lexicographic comparison of two symbols (-1/0/1)
inline int cmp_sym(const Trainer& t, int32_t x, int32_t y) {
  if (x == y) return 0;
  uint64_t px = t.sym_prefix[(size_t)x], py = t.sym_prefix[(size_t)y];
  if (px != py) return px < py ? -1 : 1;
  return t.sym_bytes[(size_t)x].compare(t.sym_bytes[(size_t)y]);
}

// Python-tuple ordering of ((count, lbytes, rbytes)): returns true when
// (ca, a) < (cb, b).
bool pair_less(const Trainer& t, int64_t ca, uint64_t a, int64_t cb,
               uint64_t b) {
  if (ca != cb) return ca < cb;
  int c = cmp_sym(t, (int32_t)(a >> 32), (int32_t)(b >> 32));
  if (c != 0) return c < 0;
  return cmp_sym(t, (int32_t)(a & 0xFFFFFFFF), (int32_t)(b & 0xFFFFFFFF)) < 0;
}

struct HeapLess {
  const Trainer* t;
  bool operator()(const HeapEntry& x, const HeapEntry& y) const {
    return pair_less(*t, x.count, x.key, y.count, y.key);
  }
};

void heap_push(Trainer& t, uint64_t key, int64_t count) {
  if (count < t.heap_min) return;
  t.heap.push_back({count, key});
  std::push_heap(t.heap.begin(), t.heap.end(), HeapLess{&t});
}

// Rebuild the selection heap from the live pair map, choosing the largest
// threshold (>= floor) that still admits ~`target` entries. One linear
// pass to histogram counts, one to collect.
void heap_rebuild(Trainer& t, size_t target, int64_t floor_min) {
  // Exponential histogram of live counts (bucket = bit width) picks the
  // threshold cheaply without sorting.
  size_t by_bits[64] = {0};
  t.pairs.for_each([&](uint64_t, const PairRec& rec) {
    if (rec.count > 0) ++by_bits[63 - __builtin_clzll((uint64_t)rec.count)];
  });
  int64_t thr = floor_min;
  size_t admitted = 0;
  for (int b = 63; b >= 0; --b) {
    admitted += by_bits[b];
    if (admitted >= target) {
      thr = (int64_t)1 << b;  // every count in bucket b is >= 2^b
      break;
    }
  }
  if (thr < floor_min) thr = floor_min;
  t.heap_min = thr;
  t.heap.clear();
  t.pairs.for_each([&](uint64_t key, const PairRec& rec) {
    if (rec.count >= thr) t.heap.push_back({rec.count, key});
  });
  std::make_heap(t.heap.begin(), t.heap.end(), HeapLess{&t});
}

void add_word_pairs(Trainer& t, int32_t wi, int64_t f, bool heap_live) {
  const int32_t* w = t.word_data.data() + t.word_off[(size_t)wi];
  int32_t wl = t.word_len[(size_t)wi];
  for (int32_t j = 0; j + 1 < wl; ++j) {
    uint64_t key = pkey(w[j], w[j + 1]);
    PairRec& rec = t.pairs.get_or_insert(key);
    rec.count += f;
    rec.add_word(wi);
    if (heap_live) heap_push(t, key, rec.count);
  }
}

}  // namespace

extern "C" {

// Train up to num_merges merges over (words, lens, counts). Words are raw
// byte strings; initial symbols are the 256 single bytes.
void* yabpe_train(const uint8_t* words_blob, const int32_t* word_lens,
                  const int64_t* word_counts, int64_t n_words,
                  int32_t num_merges, int64_t min_frequency) {
  Trainer* t = new Trainer();
  // At initialization every symbol is a single byte, so at most 256*256
  // distinct pairs can exist; the map rehash-doubles on demand, so a large
  // word table must not inflate the initial allocation (583k unique words
  // would otherwise reserve a ~2M-slot table where ~64k suffices).
  size_t pair_hint = (size_t)n_words < (size_t)65536 ? (size_t)n_words
                                                     : (size_t)65536;
  t->pairs.reset(pair_hint);  // grows as needed
  t->sym_bytes.reserve(256 + (size_t)num_merges);
  for (int b = 0; b < 256; ++b) {
    t->sym_bytes.emplace_back(1, (char)(uint8_t)b);
    t->sym_prefix.push_back(prefix_key(t->sym_bytes.back()));
    t->sym_of.emplace(t->sym_bytes.back(), b);
  }
  t->counts.assign(word_counts, word_counts + n_words);
  {
    int64_t total = 0;
    for (int64_t i = 0; i < n_words; ++i) total += word_lens[i];
    t->word_data.resize((size_t)total);
    t->word_off.resize((size_t)n_words);
    t->word_len.assign(word_lens, word_lens + n_words);
  }
  int64_t off = 0;
  for (int64_t i = 0; i < n_words; ++i) {
    t->word_off[(size_t)i] = off;
    for (int32_t j = 0; j < word_lens[i]; ++j) {
      t->word_data[(size_t)(off + j)] = (int32_t)words_blob[off + j];
    }
    off += word_lens[i];
    add_word_pairs(*t, (int32_t)i, t->counts[(size_t)i], false);
  }
  // Bulk-build the thresholded selection heap (see heap_rebuild): sized to
  // a multiple of the remaining merges so sifts stay in cache.
  int64_t floor_min = min_frequency > 1 ? min_frequency : 1;
  const size_t kHeapTarget = 1 << 16;
  heap_rebuild(*t, (size_t)num_merges * 2 + kHeapTarget, floor_min);

  std::vector<uint64_t> dirty_scratch;
  std::vector<int32_t> affected_scratch;
  for (int32_t m = 0; m < num_merges; ++m) {
    // argmax (count, lex-greatest pair) via the lazy heap: pop until the
    // top entry's count matches the pair's live count. The ordering is
    // total, so the winner is deterministic. An empty heap only proves no
    // live pair has count >= heap_min; lower the threshold and rebuild
    // until heap_min hits the min_frequency floor.
    bool have = false;
    uint64_t best = 0;
    int64_t best_count = 0;
    while (true) {
      while (!t->heap.empty()) {
        const HeapEntry top = t->heap.front();
        PairRec* pit = t->pairs.find(top.key);
        if (pit != nullptr && pit->count == top.count && top.count > 0) {
          have = true;
          best = top.key;
          best_count = top.count;
          break;
        }
        std::pop_heap(t->heap.begin(), t->heap.end(), HeapLess{t});
        t->heap.pop_back();  // stale entry
      }
      if (have || t->heap_min <= floor_min) break;
      int64_t lowered = t->heap_min / 8;
      t->heap_min = lowered > floor_min ? lowered : floor_min;
      heap_rebuild(*t, (size_t)(num_merges - m) * 2 + kHeapTarget,
                   t->heap_min);
    }
    if (!have || best_count < min_frequency) break;
    // Periodic stale purge: keeps the heap's working set cache-sized.
    if (t->heap.size() > 8 * ((size_t)(num_merges - m) * 2 + kHeapTarget)) {
      heap_rebuild(*t, (size_t)(num_merges - m) * 2 + kHeapTarget,
                   t->heap_min);
    }

    int32_t a = (int32_t)(best >> 32), b = (int32_t)(best & 0xFFFFFFFF);
    std::string merged = t->sym_bytes[(size_t)a] + t->sym_bytes[(size_t)b];
    int32_t c;
    auto it = t->sym_of.find(merged);
    if (it != t->sym_of.end()) {
      c = it->second;  // dedup branch: token already exists
    } else {
      c = (int32_t)t->sym_bytes.size();
      t->sym_bytes.push_back(merged);
      t->sym_prefix.push_back(prefix_key(merged));
      t->sym_of.emplace(t->sym_bytes.back(), c);
    }
    t->merges.push_back({a, b});

    // Apply to affected words; update pair counts incrementally. Heap
    // refreshes are coalesced: a pair's count may change once per affected
    // word, but it gets exactly ONE fresh heap entry per merge iteration
    // (collected in `dirty`, flushed below) — pushing on every change made
    // heap sifts ~70% of training time (gprof, realistic 5 MB corpus).
    std::vector<uint64_t>& dirty = dirty_scratch;
    dirty.clear();
    std::vector<int32_t>& affected = affected_scratch;
    affected.clear();
    {
      PairRec* win = t->pairs.find(best);
      affected.insert(affected.end(), win->inl, win->inl + win->n_inl);
      affected.insert(affected.end(), win->spill.begin(), win->spill.end());
    }
    t->pairs.erase(best);
    const size_t n_aff = affected.size();
    // Two-stage prefetch pipeline: the affected-word visits are the
    // memory-latency path of the whole loop (~218 cycles/word measured
    // without it), and the word METADATA (offset/len/count) loads are
    // themselves scattered, so fetch them further ahead than the word
    // data they gate. Distances picked by sweep (16/8 best on the
    // realistic 5 MB corpus: scan phase -36%, whole loop -26%).
    constexpr size_t kMetaAhead = 16;
    constexpr size_t kAhead = 8;
    for (size_t ai = 0; ai < n_aff; ++ai) {
      if (ai + kMetaAhead < n_aff) {
        int32_t mw = affected[ai + kMetaAhead];
        __builtin_prefetch(&t->word_off[(size_t)mw]);
        __builtin_prefetch(&t->word_len[(size_t)mw]);
        __builtin_prefetch(&t->counts[(size_t)mw]);
      }
      if (ai + kAhead < n_aff) {
        int32_t nw = affected[ai + kAhead];
        const int32_t* wd = t->word_data.data() + t->word_off[(size_t)nw];
        __builtin_prefetch(wd);
        if (t->word_len[(size_t)nw] > 16) __builtin_prefetch(wd + 16);
      }
      int32_t wi = affected[ai];
      int32_t* w = t->word_data.data() + t->word_off[(size_t)wi];
      int32_t wl = t->word_len[(size_t)wi];
      // Find the leftmost AND rightmost occurrences; the index may list
      // words that no longer contain the pair (staleness). Only pairs
      // overlapping [first, last+1] can change: the prefix before the
      // first occurrence is untouched, and the suffix after the last
      // occurrence merely shifts left — its pair MULTISET is invariant —
      // so neither needs count updates (the reference decrements and
      // re-increments the suffix too, which cancels exactly).
      int32_t first = -1, last = -1;
      for (int32_t j = 0; j + 1 < wl; ++j) {
        if (w[j] == a && w[j + 1] == b) {
          if (first < 0) first = j;
          last = j;
        }
      }
      if (first < 0) continue;
      int64_t f = t->counts[(size_t)wi];
      int32_t lo = first > 0 ? first - 1 : 0;
      int32_t hi = last + 1 < wl - 1 ? last + 1 : wl - 2;  // last pair idx
      int32_t tail_elems = wl - (last + 2);  // elements strictly after
      // decrement old pairs in the affected window (mark dirty)
      for (int32_t j = lo; j <= hi; ++j) {
        uint64_t key = pkey(w[j], w[j + 1]);
        PairRec* pit = t->pairs.find(key);
        if (pit != nullptr) {
          pit->count -= f;
          if (pit->count <= 0) {
            t->pairs.erase(key);
          } else if (pit->gen != m) {
            pit->gen = m;
            dirty.push_back(key);
          }
        }
      }
      // in-place leftmost-to-right merge scan (reference trainer.py:276-285)
      int32_t k = first, j = first;
      while (j <= last + 1) {
        if (j + 1 < wl && w[j] == a && w[j + 1] == b) {
          w[k++] = c;
          j += 2;
        } else {
          w[k++] = w[j++];
        }
      }
      if (tail_elems > 0 && k != j) {
        memmove(w + k, w + j, (size_t)tail_elems * sizeof(int32_t));
      }
      wl = k + tail_elems;
      t->word_len[(size_t)wi] = wl;
      // increment new pairs in the affected window (and index the word);
      // the new window ends where the compacted changed region meets the
      // shifted (unchanged) suffix.
      int32_t hi2 = k - 1 < wl - 2 ? k - 1 : wl - 2;
      for (int32_t j2 = lo; j2 <= hi2; ++j2) {
        uint64_t key = pkey(w[j2], w[j2 + 1]);
        PairRec& rec = t->pairs.get_or_insert(key);
        rec.count += f;
        rec.add_word(wi);
        if (rec.gen != m) {
          rec.gen = m;
          dirty.push_back(key);
        }
      }
    }
    // One heap entry per touched, still-live pair with its final count.
    // (A pair erased then re-created within this merge can appear twice in
    // `dirty`; the duplicate entry is harmless — pop validation drops it.)
    for (uint64_t key : dirty) {
      PairRec* pit = t->pairs.find(key);
      if (pit != nullptr && pit->count > 0) {
        heap_push(*t, key, pit->count);
      }
    }
  }
  return t;
}

int32_t yabpe_train_num_merges(const void* h) {
  return (int32_t)((const Trainer*)h)->merges.size();
}

void yabpe_train_merges(const void* h, int32_t* out) {
  const Trainer* t = (const Trainer*)h;
  for (size_t i = 0; i < t->merges.size(); ++i) {
    out[2 * i] = t->merges[i][0];
    out[2 * i + 1] = t->merges[i][1];
  }
}

int32_t yabpe_train_num_syms(const void* h) {
  return (int32_t)((const Trainer*)h)->sym_bytes.size();
}

int64_t yabpe_train_syms_total_bytes(const void* h) {
  const Trainer* t = (const Trainer*)h;
  int64_t total = 0;
  for (const std::string& s : t->sym_bytes) total += (int64_t)s.size();
  return total;
}

void yabpe_train_export_syms(const void* h, uint8_t* blob, int32_t* lens) {
  const Trainer* t = (const Trainer*)h;
  int64_t off = 0;
  for (size_t i = 0; i < t->sym_bytes.size(); ++i) {
    const std::string& s = t->sym_bytes[i];
    memcpy(blob + off, s.data(), s.size());
    lens[i] = (int32_t)s.size();
    off += (int64_t)s.size();
  }
}

void yabpe_train_free(void* h) { delete (Trainer*)h; }

}  // extern "C"
