// Native host data path for figbird_tpu.
//
// The reference implements its entire host runtime in C++ (Preprocess.cpp,
// FillGaps.cpp stream parsing; bowtie2-build's index construction).  This
// library provides the TPU framework's equivalents for the IO/indexing hot
// path, exposed through a C ABI consumed via ctypes (figbird_tpu/io/native.py):
//
//   * FASTQ parsing straight into dense int8 code matrices (the ReadBatch
//     device layout) — replaces Reverse.cpp/Preprocess.cpp stdio loops;
//   * k-mer table construction (rolling codes + sort by code) — replaces
//     bowtie2-build for our searchsorted-based device lookup (align/index.py).
//
// Build: `make -C native` -> libfigbird_native.so.  The Python layer falls
// back to numpy when the library is absent.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// byte -> code table: A/a=0 C/c=1 G/g=2 T/t=3 other=4
static int8_t CODE[256];
static bool code_init = false;
static void init_codes() {
  if (code_init) return;
  memset(CODE, 4, sizeof(CODE));
  CODE[(unsigned)'A'] = CODE[(unsigned)'a'] = 0;
  CODE[(unsigned)'C'] = CODE[(unsigned)'c'] = 1;
  CODE[(unsigned)'G'] = CODE[(unsigned)'g'] = 2;
  CODE[(unsigned)'T'] = CODE[(unsigned)'t'] = 3;
  code_init = true;
}

// Count FASTQ records (4-line records).
int64_t fb_count_fastq(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t lines = 0;
  char buf[1 << 16];
  size_t n;
  while ((n = fread(buf, 1, sizeof(buf), f)) > 0)
    for (size_t i = 0; i < n; i++) lines += (buf[i] == '\n');
  fclose(f);
  return lines / 4;
}

// Scan: record count + maximum sequence-line length in one pass.
int64_t fb_scan_fastq(const char* path, int32_t* maxlen_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t line_no = 0;
  int32_t maxlen = 0, cur = 0;
  char buf[1 << 16];
  size_t n;
  while ((n = fread(buf, 1, sizeof(buf), f)) > 0) {
    for (size_t i = 0; i < n; i++) {
      if (buf[i] == '\n') {
        if ((line_no & 3) == 1 && cur > maxlen) maxlen = cur;
        line_no++;
        cur = 0;
      } else if (buf[i] != '\r') {
        cur++;
      }
    }
  }
  if ((line_no & 3) == 1 && cur > maxlen) maxlen = cur;
  fclose(f);
  *maxlen_out = maxlen;
  return line_no / 4;
}

// Parse a FASTQ file into dense (n, max_len) int8 codes (+lengths, quals).
// Buffers are caller-allocated with n rows.  Returns records parsed or -1.
int64_t fb_parse_fastq(const char* path, int64_t n, int32_t max_len,
                       int8_t* seq_out, int32_t* len_out, uint8_t* qual_out) {
  init_codes();
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // pre-fill with N
  memset(seq_out, 4, (size_t)n * max_len);
  if (qual_out) memset(qual_out, 0, (size_t)n * max_len);

  std::vector<char> line(1 << 20);
  int64_t rec = 0;
  int phase = 0;  // 0=@id 1=seq 2=+ 3=qual
  while (rec < n && fgets(line.data(), (int)line.size(), f)) {
    size_t len = strlen(line.data());
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) len--;
    if (phase == 1) {
      int32_t m = (int32_t)std::min<size_t>(len, max_len);
      int8_t* row = seq_out + rec * (int64_t)max_len;
      for (int32_t i = 0; i < m; i++) row[i] = CODE[(unsigned char)line[i]];
      len_out[rec] = m;
    } else if (phase == 3) {
      if (qual_out) {
        int32_t m = (int32_t)std::min<size_t>(len, max_len);
        uint8_t* row = qual_out + rec * (int64_t)max_len;
        memcpy(row, line.data(), m);
      }
      rec++;
    }
    phase = (phase + 1) & 3;
  }
  fclose(f);
  return rec;
}

// Build the sorted k-mer table over an encoded flat genome.
// flat: int8 codes (4 = N / pad).  Emits (code,pos) pairs sorted by code.
// Two-phase: call with codes_out==NULL to get the count, then fill.
int64_t fb_build_kmer_table(const int8_t* flat, int64_t n, int32_t k,
                            int32_t* codes_out, int32_t* pos_out) {
  if (k > 15 || k < 1 || n < k) return 0;
  // rolling code with N-run invalidation
  int64_t m = 0;
  const int32_t mask_shift = 2 * (k - 1);
  int32_t code = 0;
  int32_t run = 0;  // consecutive valid bases ending at i
  if (!codes_out) {
    for (int64_t i = 0; i < n; i++) {
      int8_t c = flat[i];
      if (c >= 4) { run = 0; continue; }
      run++;
      if (run >= k) m++;
    }
    return m;
  }
  struct Entry { int32_t code, pos; };
  std::vector<Entry> entries;
  entries.reserve(1 << 20);
  code = 0; run = 0;
  const int32_t mask = (k == 15) ? 0x3FFFFFFF : ((1 << (2 * k)) - 1);
  for (int64_t i = 0; i < n; i++) {
    int8_t c = flat[i];
    if (c >= 4) { run = 0; code = 0; continue; }
    code = ((code << 2) | c) & mask;
    run++;
    if (run >= k) entries.push_back({code, (int32_t)(i - k + 1)});
  }
  std::stable_sort(entries.begin(), entries.end(),
                   [](const Entry& a, const Entry& b) { return a.code < b.code; });
  for (size_t i = 0; i < entries.size(); i++) {
    codes_out[i] = entries[i].code;
    pos_out[i] = entries[i].pos;
  }
  return (int64_t)entries.size();
}

// Reverse complement rows of a dense batch in place of their lengths.
void fb_revcomp_batch(int8_t* seq, const int32_t* lens, int64_t n,
                      int32_t max_len) {
  static const int8_t COMP[5] = {3, 2, 1, 0, 4};
  std::vector<int8_t> tmp(max_len);
  for (int64_t r = 0; r < n; r++) {
    int8_t* row = seq + r * (int64_t)max_len;
    int32_t L = lens[r];
    for (int32_t i = 0; i < L; i++) tmp[i] = COMP[row[L - 1 - i]];
    memcpy(row, tmp.data(), L);
  }
}

}  // extern "C"
