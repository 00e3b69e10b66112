// NanoSNP-TPU native host kernel: mpileup text -> per-position 18-channel
// count tensors + candidate flags + alt-allele summaries.
//
// Semantics match the reference TensorMaker
// (dna_sv_tensor/src/make_candidate_snp_tensor/tensor_maker.cpp:61-249,
// main.cpp:196-201), verified by differential tests against the reference
// binary. The architecture is new: instead of a single-threaded streaming
// ring buffer, rows are parsed fully in parallel (OpenMP over row ranges)
// into flat arrays; window assembly happens downstream as a vectorized
// gather. alt-info strings are packed into one buffer with offsets.
//
// Build: g++ -O3 -march=native -std=c++17 -fopenmp -shared -fPIC
//        -o libnanosnp.so pileup_core.cpp

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

enum Channel {
  CH_A = 0, CH_C, CH_G, CH_T, CH_I, CH_I1, CH_D, CH_D1, CH_STAR,
  CH_a, CH_c, CH_g, CH_t, CH_i, CH_i1, CH_d, CH_d1, CH_POUND,
  NUM_CH
};

struct Tables {
  uint8_t nt4[256];        // ACGTacgt -> 0..3, else 4
  int8_t ch[256];          // single mpileup char -> channel, else -1
  bool normal[256];        // ACGTNacgtn*#
  bool fwd[256];           // ACGTN*
  Tables() {
    std::memset(nt4, 4, sizeof(nt4));
    const char* b = "ACGT";
    for (int i = 0; i < 4; ++i) {
      nt4[(int)b[i]] = i;
      nt4[(int)std::tolower(b[i])] = i;
    }
    std::memset(ch, -1, sizeof(ch));
    ch[(int)'A'] = CH_A; ch[(int)'C'] = CH_C; ch[(int)'G'] = CH_G;
    ch[(int)'T'] = CH_T; ch[(int)'a'] = CH_a; ch[(int)'c'] = CH_c;
    ch[(int)'g'] = CH_g; ch[(int)'t'] = CH_t;
    ch[(int)'*'] = CH_STAR; ch[(int)'#'] = CH_POUND;
    std::memset(normal, 0, sizeof(normal));
    for (const char* p = "ACGTNacgtn*#"; *p; ++p) normal[(int)*p] = true;
    std::memset(fwd, 0, sizeof(fwd));
    for (const char* p = "ACGTN*"; *p; ++p) fwd[(int)*p] = true;
  }
};
const Tables T;

// Parse one row's base string; fill counts[18]; return alt-info pieces.
struct RowResult {
  int64_t depth = 0;
  double af = 0.0;
  bool pass_af = false;
  int max_del_length = 0;
  std::string alt_info;  // "key cnt key cnt " (sorted keys), empty if no alts
};

void parse_row(const char* bases, int64_t blen, const char* ref_seq,
               int64_t ref_len, int64_t pos1, double snp_min_af,
               double indel_min_af, int max_indel, int32_t* counts,
               RowResult* out, bool want_alt_info) {
  char raw_ref = (pos1 - 1 < ref_len) ? ref_seq[pos1 - 1] : 'N';
  char chr_base, chr_base_lower;
  if (T.nt4[(uint8_t)raw_ref] < 4) {
    chr_base = std::toupper(raw_ref);
    chr_base_lower = std::tolower(raw_ref);
  } else {
    chr_base = 'A';
    chr_base_lower = 'a';
  }

  std::memset(counts, 0, NUM_CH * sizeof(int32_t));

  // single-char observations in a flat table; indel observations keyed by
  // their raw text (strand-cased) for the most-frequent-single-obs channels
  int32_t singles[256];
  std::memset(singles, 0, sizeof(singles));
  std::map<std::string, int> indels;

  int64_t i = 0;
  std::string key;
  while (i < blen) {
    char b = bases[i];
    if (b == '+' || b == '-') {
      ++i;
      int64_t adv = 0;
      while (i < blen && bases[i] >= '0' && bases[i] <= '9') {
        adv = adv * 10 + (bases[i] - '0');
        ++i;
      }
      if (adv <= max_indel) {
        key.assign(1, b);
        key.append(bases + i, (size_t)adv);
        ++indels[key];
      }
      i += adv - 1;
    } else if (T.normal[(uint8_t)b]) {
      ++singles[(uint8_t)b];
    } else if (b == '^') {
      ++i;
    }
    ++i;
  }

  // aggregate: alt_dict + pileup_dict, channels, depth
  int64_t depth = 0;
  int max_ins0 = 0, max_ins1 = 0, max_del0 = 0, max_del1 = 0;
  int max_del_length = 0;
  std::map<std::string, int> alt_dict;   // ordered like the reference output
  int32_t base_counts[4] = {0, 0, 0, 0}; // pileup_dict A C G T
  int32_t ins_total = 0, del_total = 0;

  for (int c = 0; c < 256; ++c) {
    int32_t cnt = singles[c];
    if (!cnt) continue;
    if (T.nt4[c] < 4) {
      char up = (char)std::toupper(c);
      base_counts[T.nt4[c]] += cnt;
      depth += cnt;
      if (up != chr_base) alt_dict[std::string("X") + up] += cnt;
      counts[T.ch[c]] += cnt;
    } else if (c == '*') {
      counts[CH_STAR] += cnt;
      depth += cnt;
    } else if (c == '#') {
      counts[CH_POUND] += cnt;
      depth += cnt;
    }
    // N/n: ignored entirely
  }

  std::string alt_key;
  for (auto& kv : indels) {
    const std::string& k = kv.first;
    int cnt = kv.second;
    bool is_fwd = T.fwd[(uint8_t)k[1]];
    if (k[0] == '+') {
      alt_key.assign(1, 'I');
      alt_key += chr_base;
      for (size_t p = 1; p < k.size(); ++p) alt_key += (char)std::toupper(k[p]);
      alt_dict[alt_key] += cnt;
      ins_total += cnt;
      if (is_fwd) {
        counts[CH_I] += cnt;
        max_ins0 = std::max(max_ins0, cnt);
      } else {
        counts[CH_i] += cnt;
        max_ins1 = std::max(max_ins1, cnt);
      }
    } else {
      int dlen = (int)k.size() - 1;
      alt_key.assign(1, 'D');
      for (int p = 1; p <= dlen; ++p) {
        alt_key += (pos1 + p - 1 < ref_len) ? ref_seq[pos1 + p - 1] : 'N';
      }
      alt_dict[alt_key] += cnt;
      del_total += cnt;
      max_del_length = std::max(max_del_length, dlen);
      if (is_fwd) {
        counts[CH_D] += cnt;
        max_del0 = std::max(max_del0, cnt);
      } else {
        counts[CH_d] += cnt;
        max_del1 = std::max(max_del1, cnt);
      }
    }
  }

  counts[CH_I1] = max_ins0;
  counts[CH_i1] = max_ins1;
  counts[CH_D1] = max_del0;
  counts[CH_d1] = max_del1;

  int64_t denom = depth ? depth : 1;

  // pileup list in sorted-key order (A C D G I T), then stable by count desc
  struct Item { char key; int32_t cnt; };
  Item items[6];
  int n_items = 0;
  const char key_order[6] = {'A', 'C', 'D', 'G', 'I', 'T'};
  for (char kc : key_order) {
    int32_t cnt = 0;
    if (kc == 'I') cnt = ins_total;
    else if (kc == 'D') cnt = del_total;
    else cnt = base_counts[T.nt4[(uint8_t)kc]];
    if (cnt) items[n_items++] = {kc, cnt};
  }
  std::stable_sort(items, items + n_items,
                   [](const Item& a, const Item& b) { return a.cnt > b.cnt; });

  bool pass_af = n_items > 0 && items[0].key != chr_base;
  bool pass_snp = false, pass_indel = false;
  for (int t = 0; t < n_items; ++t) {
    if (items[t].key == chr_base) continue;
    double freq = (double)items[t].cnt / (double)denom;
    if (items[t].key == 'I' || items[t].key == 'D') {
      pass_indel = pass_indel || (freq >= indel_min_af);
    } else {
      pass_snp = pass_snp || (freq >= snp_min_af);
    }
  }

  double af = (n_items > 1) ? (double)items[1].cnt / (double)denom : 0.0;
  if (n_items > 0 && items[0].key != chr_base)
    af = (double)items[0].cnt / (double)denom;

  // reference-base negation
  int32_t fwd_sum = counts[CH_A] + counts[CH_C] + counts[CH_G] + counts[CH_T];
  counts[T.ch[(uint8_t)chr_base]] = -fwd_sum;
  int32_t rev_sum = counts[CH_a] + counts[CH_c] + counts[CH_g] + counts[CH_t];
  counts[T.ch[(uint8_t)chr_base_lower]] = -rev_sum;

  out->depth = depth;
  out->af = af;
  out->pass_af = pass_af || pass_snp || pass_indel;
  out->max_del_length = max_del_length;
  if (want_alt_info) {
    out->alt_info.clear();
    char tmp[32];
    for (auto& kv : alt_dict) {
      out->alt_info += kv.first;
      int n = std::snprintf(tmp, sizeof(tmp), " %d ", kv.second);
      out->alt_info.append(tmp, n);
    }
  }
}

}  // namespace

extern "C" {

int64_t nsp_count_rows(const char* buf, int64_t len) {
  int64_t n = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    if (!nl) { ++n; break; }
    if (nl > p) ++n;   // skip empty lines
    p = nl + 1;
  }
  return n;
}

// Returns number of rows written (after bed filtering), or -(needed_alt_cap)
// if alt_buf is too small.
int64_t nsp_parse_mpileup(
    const char* buf, int64_t len,
    const char* ref_seq, int64_t ref_len,
    double snp_min_af, double indel_min_af, int min_coverage, int max_indel,
    const uint8_t* bed_mask, const uint8_t* confident_mask,
    int n_threads,
    int64_t* positions, int32_t* counts, int32_t* depths,
    uint8_t* is_candidate, double* afs,
    char* alt_buf, int64_t alt_cap, int64_t* alt_off) {
  // index line starts
  std::vector<std::pair<const char*, const char*>> lines;
  {
    const char* p = buf;
    const char* end = buf + len;
    while (p < end) {
      const char* nl = (const char*)memchr(p, '\n', end - p);
      const char* eol = nl ? nl : end;
      if (eol > p) lines.emplace_back(p, eol);
      p = eol + 1;
    }
  }
  const int64_t n = (int64_t)lines.size();

#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif

  std::vector<std::string> alt_strs(n);
  std::vector<uint8_t> keep(n, 1);

#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n; ++r) {
    const char* p = lines[r].first;
    const char* eol = lines[r].second;
    // columns: chrom \t pos \t ref \t depth \t bases \t quals
    const char* t1 = (const char*)memchr(p, '\t', eol - p);
    if (!t1) { keep[r] = 0; continue; }   // malformed row: skip
    int64_t pos1 = 0;
    const char* q = t1 + 1;
    bool has_digit = false;
    while (q < eol && *q >= '0' && *q <= '9') {
      pos1 = pos1 * 10 + (*q++ - '0');
      has_digit = true;
    }
    if (!has_digit || pos1 <= 0) { keep[r] = 0; continue; }
    if (bed_mask && (pos1 - 1 >= ref_len || !bed_mask[pos1 - 1])) {
      keep[r] = 0;
      continue;
    }
    // skip to column 4 (bases)
    const char* c = q;
    for (int skip = 0; skip < 3 && c; ++skip) {
      c = (const char*)memchr(c, '\t', eol - c);
      if (c) ++c;
    }
    if (!c) { keep[r] = 0; continue; }    // missing bases column: skip
    const char* bases = c;
    const char* bend = (const char*)memchr(bases, '\t', eol - bases);
    if (!bend) bend = eol;

    int32_t* row_counts = counts + r * NUM_CH;
    RowResult res;
    parse_row(bases, bend - bases, ref_seq, ref_len, pos1, snp_min_af,
              indel_min_af, max_indel, row_counts, &res, true);

    char ref_base = (pos1 - 1 < ref_len)
                        ? (char)std::toupper(ref_seq[pos1 - 1]) : 'N';
    bool ok_bed = true;
    if (confident_mask) {
      ok_bed = false;
      int64_t lo = pos1 - 1;
      int64_t hi = std::min<int64_t>(pos1 + res.max_del_length + 1, ref_len);
      for (int64_t k = lo; k < hi; ++k) {
        if (confident_mask[k]) { ok_bed = true; break; }
      }
    }
    bool cand = ok_bed && T.nt4[(uint8_t)ref_base] < 4 && res.pass_af &&
                res.depth >= min_coverage;
    positions[r] = pos1;
    depths[r] = (int32_t)res.depth;
    afs[r] = res.af;
    is_candidate[r] = cand ? 1 : 0;
    if (cand) alt_strs[r] = std::move(res.alt_info);
  }

  // compact bed-dropped rows; pack alt strings
  int64_t w = 0;
  int64_t alt_used = 0;
  for (int64_t r = 0; r < n; ++r) {
    if (!keep[r]) continue;
    if (w != r) {
      positions[w] = positions[r];
      depths[w] = depths[r];
      afs[w] = afs[r];
      is_candidate[w] = is_candidate[r];
      std::memcpy(counts + w * NUM_CH, counts + r * NUM_CH,
                  NUM_CH * sizeof(int32_t));
    }
    int64_t sl = (int64_t)alt_strs[r].size();
    alt_off[2 * w] = alt_used;
    alt_off[2 * w + 1] = alt_used + sl;
    if (alt_used + sl <= alt_cap) {
      std::memcpy(alt_buf + alt_used, alt_strs[r].data(), sl);
    }
    alt_used += sl;
    ++w;
  }
  if (alt_used > alt_cap) return -alt_used;
  return w;
}

}  // extern "C"
