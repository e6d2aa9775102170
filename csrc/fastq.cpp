// Native FASTQ/FASTA record scanner — the kseq.h equivalent for
// multi-GB/s ingest.  Scans a buffer once and emits per-record offsets
// (name/seq/qual spans); base encoding stays in numpy (a table lookup
// over the span is already vectorized there).

#include <cstdint>

extern "C" {

// Offsets layout per record (5 int64): name_s, name_e, seq_s, seq_e,
// qual_s (qual length == seq length; qual_s = -1 for FASTA records).
// Returns the number of records parsed (<= max_rec), or -1 on a
// malformed buffer.
int64_t bwamem_fastq_scan(const char* buf, int64_t n, int64_t max_rec,
                          int64_t* off) {
  int64_t i = 0, rec = 0;
  auto skip_eol = [&](int64_t& p) {
    while (p < n && (buf[p] == '\n' || buf[p] == '\r')) ++p;
  };
  auto find_eol = [&](int64_t p) {
    while (p < n && buf[p] != '\n' && buf[p] != '\r') ++p;
    return p;
  };
  skip_eol(i);
  while (i < n && rec < max_rec) {
    char tag = buf[i];
    if (tag != '@' && tag != '>') return -1;
    int64_t name_s = i + 1;
    int64_t name_e = name_s;
    while (name_e < n && buf[name_e] != '\n' && buf[name_e] != '\r' &&
           buf[name_e] != ' ' && buf[name_e] != '\t')
      ++name_e;
    int64_t line_e = find_eol(name_e);
    int64_t p = line_e;
    skip_eol(p);
    if (tag == '@') {
      int64_t seq_s = p;
      int64_t seq_e = find_eol(p);
      p = seq_e;
      skip_eol(p);
      if (p >= n || buf[p] != '+') return -1;
      p = find_eol(p);
      skip_eol(p);
      int64_t qual_s = p;
      int64_t qual_e = qual_s + (seq_e - seq_s);
      if (qual_e > n) return -1;
      off[rec * 5 + 0] = name_s;
      off[rec * 5 + 1] = name_e;
      off[rec * 5 + 2] = seq_s;
      off[rec * 5 + 3] = seq_e;
      off[rec * 5 + 4] = qual_s;
      ++rec;
      i = qual_e;
      skip_eol(i);
    } else {  // FASTA: sequence possibly multi-line — record spans until
              // the next header; caller strips newlines from the span
      int64_t seq_s = p;
      while (p < n && buf[p] != '>' && buf[p] != '@') {
        p = find_eol(p);
        skip_eol(p);
      }
      off[rec * 5 + 0] = name_s;
      off[rec * 5 + 1] = name_e;
      off[rec * 5 + 2] = seq_s;
      off[rec * 5 + 3] = p;
      off[rec * 5 + 4] = -1;
      ++rec;
      i = p;
    }
  }
  return rec;
}

}  // extern "C"
