// bwbble_tpu native runtime: SA-IS suffix-array construction and FM-index
// occurrence-checkpoint construction.
//
// Fresh implementation of the SA-IS induced-sorting algorithm
// (G. Nong, S. Zhang, W. H. Chan, "Two Efficient Algorithms for Linear Time
// Suffix Array Construction", 2009).  Plays the role of the reference's
// in-RAM suffix sorter (mg-aligner/is.c) for index construction; the query
// path runs on TPU and never calls into this library.
//
// Exposed via a C ABI for ctypes (see bwbble_tpu/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Core SA-IS over an integer string whose last character is the unique
// smallest symbol (a sentinel).  SA receives the full suffix array.
template <typename I>
void sais_core(const I* s, I* SA, I n, I K) {
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  const I EMPTY = static_cast<I>(-1);

  // Suffix types: 1 = S-type (suffix smaller than its right neighbor).
  std::vector<uint8_t> st(n);
  st[n - 1] = 1;
  for (I i = n - 2; i >= 0; --i)
    st[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && st[i + 1])) ? 1 : 0;
  auto is_lms = [&](I i) { return i > 0 && st[i] && !st[i - 1]; };

  std::vector<I> bkt(K);
  auto fill_buckets = [&](bool ends) {
    std::fill(bkt.begin(), bkt.end(), I(0));
    for (I i = 0; i < n; ++i) bkt[s[i]]++;
    I sum = 0;
    for (I k = 0; k < K; ++k) {
      sum += bkt[k];
      bkt[k] = ends ? sum : sum - bkt[k];
    }
  };

  auto induce = [&]() {
    // induce L-type from bucket heads (left to right)
    fill_buckets(false);
    for (I i = 0; i < n; ++i) {
      I j = SA[i];
      if (j != EMPTY && j > 0 && !st[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
    }
    // induce S-type from bucket ends (right to left)
    fill_buckets(true);
    for (I i = n - 1; i >= 0; --i) {
      I j = SA[i];
      if (j != EMPTY && j > 0 && st[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
    }
  };

  // Stage 1: sort LMS substrings by one induced pass.
  std::fill(SA, SA + n, EMPTY);
  fill_buckets(true);
  for (I i = 1; i < n; ++i)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  induce();

  // Compact the (now sorted) LMS positions to the front.
  I n1 = 0;
  for (I i = 0; i < n; ++i)
    if (is_lms(SA[i])) SA[n1++] = SA[i];

  // Stage 2: name LMS substrings to build the reduced problem.
  std::fill(SA + n1, SA + n, EMPTY);
  I name = 0, prev = EMPTY;
  for (I i = 0; i < n1; ++i) {
    I pos = SA[i];
    bool differs = (prev == EMPTY);
    if (!differs) {
      for (I d = 0;; ++d) {
        if (s[pos + d] != s[prev + d] || st[pos + d] != st[prev + d]) {
          differs = true;
          break;
        }
        if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
      }
    }
    if (differs) {
      ++name;
      prev = pos;
    }
    SA[n1 + pos / 2] = name - 1;
  }
  for (I i = n - 1, j = n - 1; i >= n1; --i)
    if (SA[i] != EMPTY) SA[j--] = SA[i];

  // Stage 3: solve the reduced problem (recurse only if names repeat).
  I* SA1 = SA;
  I* s1 = SA + n - n1;
  if (name < n1) {
    sais_core<I>(s1, SA1, n1, name);
  } else {
    for (I i = 0; i < n1; ++i) SA1[s1[i]] = i;
  }

  // Stage 4: place LMS suffixes in their final order and induce the rest.
  for (I i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1[j++] = i;           // LMS positions in text order
  for (I i = 0; i < n1; ++i) SA1[i] = s1[SA1[i]];
  std::fill(SA + n1, SA + n, EMPTY);
  fill_buckets(true);
  for (I i = n1 - 1; i >= 0; --i) {
    I j = SA[i];
    SA[i] = EMPTY;
    SA[--bkt[s[j]]] = j;
  }
  induce();
}

template <typename I>
int sais_u8_impl(const uint8_t* T, int64_t* SA_out, int64_t n) {
  // Append an explicit sentinel (shift symbols by +1 so 0 is unique minimum).
  std::vector<I> s(n + 1);
  for (int64_t i = 0; i < n; ++i) s[i] = static_cast<I>(T[i]) + 1;
  s[n] = 0;
  std::vector<I> SA(n + 1);
  sais_core<I>(s.data(), SA.data(), static_cast<I>(n + 1), I(257));
  // SA[0] is the sentinel suffix; drop it.
  for (int64_t i = 0; i < n; ++i) SA_out[i] = static_cast<int64_t>(SA[i + 1]);
  return 0;
}

}  // namespace

extern "C" {

// Suffix array of T[0..n-1] (bytes).  SA receives n entries.
int bwbble_sais_u8(const uint8_t* T, int64_t* SA, int64_t n) {
  if (n <= 0) return 0;
  if (n + 1 < (int64_t{1} << 31))
    return sais_u8_impl<int32_t>(T, SA, n);
  return sais_u8_impl<int64_t>(T, SA, n);
}

// Occurrence checkpoints for a 16-symbol BWT: out[k*16 + c] = number of
// occurrences of c in bwt[0 .. k*interval] (inclusive), skipping the sa0
// sentinel row (semantics of mg-aligner/bwt.c:280-291).
void bwbble_build_occ(const uint8_t* bwt, int64_t n, int64_t sa0,
                      int64_t interval, int64_t* out) {
  int64_t counts[16] = {0};
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i != sa0) counts[bwt[i]]++;
    if (i % interval == 0) {
      std::memcpy(out + k * 16, counts, sizeof(counts));
      ++k;
    }
  }
}

// ---------------------------------------------------------------- FASTQ

namespace {
// nt4 encoding (A=0, G=1, C=2, T=3, everything else N=4; io.h:113-130)
// and nt4 complement (io.h:110), matching bwbble_tpu.constants.
struct Nt4Tables {
  int8_t enc[256];
  int8_t compl_[5] = {3, 2, 1, 0, 4};
  Nt4Tables() {
    std::fill(enc, enc + 256, int8_t(4));
    enc['A'] = enc['a'] = 0;
    enc['G'] = enc['g'] = 1;
    enc['C'] = enc['c'] = 2;
    enc['T'] = enc['t'] = 3;
  }
};
const Nt4Tables kNt4;

inline int64_t find_byte(const uint8_t* d, int64_t from, int64_t n,
                         uint8_t c) {
  const void* p = std::memchr(d + from, c, static_cast<size_t>(n - from));
  return p ? static_cast<const uint8_t*>(p) - d : -1;
}

// One record scan step shared by both passes.  Returns 1 on a parsed
// record, 0 at end of input, -1 on malformed input.  Mirrors
// bwbble_tpu.formats.fastq.parse_fastq_bytes exactly.
struct Rec {
  int64_t name_off, name_len, seq_off, seq_len, qual_off;
};
int next_record(const uint8_t* d, int64_t n, int64_t* pos, Rec* r) {
  int64_t at = find_byte(d, *pos, n, '@');
  if (at < 0) return 0;
  int64_t nl = find_byte(d, at, n, '\n');
  if (nl < 0) return 0;
  r->name_off = at + 1;
  r->name_len = std::min<int64_t>(nl - (at + 1), 256);
  int64_t snl = find_byte(d, nl + 1, n, '\n');
  if (snl < 0) return -1;
  int64_t seq_end = snl;
  while (seq_end > nl + 1 && d[seq_end - 1] == '\r') --seq_end;
  r->seq_off = nl + 1;
  r->seq_len = seq_end - (nl + 1);
  int64_t plus = find_byte(d, snl, n, '+');
  if (plus < 0) return -1;
  int64_t pnl = find_byte(d, plus, n, '\n');
  if (pnl < 0) return -1;
  int64_t qnl = find_byte(d, pnl + 1, n, '\n');
  if (qnl < 0) qnl = n;
  int64_t qual_end = qnl;
  while (qual_end > pnl + 1 && d[qual_end - 1] == '\r') --qual_end;
  r->qual_off = pnl + 1;
  if (qual_end - r->qual_off != r->seq_len) return -1;
  *pos = qnl + 1;
  return 1;
}
}  // namespace

// Pass 1: count records and the maximum read length.  Returns the record
// count, or -1 on malformed input (callers fall back to the Python parser
// for error reporting).
int64_t bwbble_fastq_scan(const uint8_t* data, int64_t n, int64_t* max_len) {
  int64_t pos = 0, count = 0, ml = 0;
  Rec r;
  int st;
  while ((st = next_record(data, n, &pos, &r)) == 1) {
    ++count;
    if (r.seq_len > ml) ml = r.seq_len;
    if (pos >= n) break;
  }
  if (st < 0) return -1;
  *max_len = ml;
  return count;
}

// Pass 2: fill fixed-shape batches.  seq/rc are [count, max_len] int8
// padded with 4 (N); offsets let the caller slice names/quals lazily.
int bwbble_fastq_fill(const uint8_t* data, int64_t n, int64_t count,
                      int64_t max_len, int8_t* seq, int8_t* rc,
                      int32_t* lengths, int64_t* name_off, int64_t* name_len,
                      int64_t* qual_off) {
  int64_t pos = 0;
  Rec r;
  for (int64_t i = 0; i < count; ++i) {
    if (next_record(data, n, &pos, &r) != 1) return -1;
    name_off[i] = r.name_off;
    name_len[i] = r.name_len;
    qual_off[i] = r.qual_off;
    lengths[i] = static_cast<int32_t>(r.seq_len);
    int8_t* srow = seq + i * max_len;
    int8_t* rrow = rc + i * max_len;
    std::fill(srow, srow + max_len, int8_t(4));
    std::fill(rrow, rrow + max_len, int8_t(4));
    for (int64_t j = 0; j < r.seq_len; ++j) {
      int8_t c = kNt4.enc[data[r.seq_off + j]];
      srow[j] = c;
      rrow[r.seq_len - 1 - j] = kNt4.compl_[c];
    }
  }
  return 0;
}

}  // extern "C"
