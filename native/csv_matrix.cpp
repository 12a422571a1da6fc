// Fast dense-CSV matrix reader for the framework's graph files.
//
// The reference loads its dense adjacency / STAG / STRG CSVs with pandas
// (lib/dataloader.py:5-23). For GAMBIA-scale graphs (2139 x 2139 ~ 4.6M
// numbers, ~50 MB of text) Python-side parsing dominates dataset startup on
// small hosts. This is a minimal, dependency-free parser: one pass over the
// raw bytes, no allocation per field, comma/newline delimited, handles
// integer, fixed-point and exponent forms. Exposed to Python via ctypes
// (dstagnn_drought_tpu/data/native.py) with a numpy fallback when the shared
// library has not been built.
//
// Build: make -C native   (produces native/libcsv_matrix.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// Single-pass parse of a dense CSV of doubles into a library-owned buffer.
// Returns the number of values, or a negative error code; *out_buf receives
// a malloc'd array the caller must release with csv_matrix_free.
//   -1: file open failure, -2: ragged rows
long long csv_matrix_read_alloc(const char* path, double** out_buf,
                                long long* out_rows, long long* out_cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char* data = static_cast<char*>(std::malloc(sz + 1));
  if (!data) { std::fclose(f); return -1; }
  long long rd = static_cast<long long>(std::fread(data, 1, sz, f));
  std::fclose(f);
  if (rd != sz) { std::free(data); return -1; }
  data[sz] = '\0';

  // capacity upper bound: one value per delimiter + 1
  long long cap = 1;
  for (long long i = 0; i < sz; ++i)
    if (data[i] == ',' || data[i] == '\n') ++cap;
  double* buf = static_cast<double*>(std::malloc(cap * sizeof(double)));
  if (!buf) { std::free(data); return -1; }

  long long count = 0, rows = 0, cols = -1, row_cols = 0;
  const char* p = data;
  const char* end = data + sz;
  while (p < end) {
    char* next = nullptr;
    double v = std::strtod(p, &next);
    if (next == p) { v = 0.0; next = const_cast<char*>(p); }
    buf[count++] = v;
    ++row_cols;
    p = next;
    while (p < end && *p != ',' && *p != '\n' && *p != '\r') ++p;
    if (p >= end || *p == '\n' || *p == '\r') {
      while (p < end && (*p == '\n' || *p == '\r')) ++p;
      ++rows;
      if (cols < 0) cols = row_cols;
      else if (row_cols != cols && row_cols != 0) {
        std::free(data); std::free(buf); return -2;
      }
      row_cols = 0;
    } else {
      ++p;
    }
  }
  if (row_cols > 0) {
    ++rows;
    if (cols < 0) cols = row_cols;
    else if (row_cols != cols) { std::free(data); std::free(buf); return -2; }
  }
  std::free(data);
  *out_buf = buf;
  if (out_rows) *out_rows = rows;
  if (out_cols) *out_cols = cols < 0 ? 0 : cols;
  return count;
}

void csv_matrix_free(double* buf) { std::free(buf); }

// Two-pass variant kept for callers that manage their own buffers.
//   -1: file open failure, -2: ragged rows, -3: buffer too small
long long csv_matrix_read(const char* path, double* buf, long long capacity,
                          long long* out_rows, long long* out_cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char* data = static_cast<char*>(std::malloc(sz + 1));
  if (!data) { std::fclose(f); return -1; }
  long long rd = static_cast<long long>(std::fread(data, 1, sz, f));
  std::fclose(f);
  if (rd != sz) { std::free(data); return -1; }
  data[sz] = '\0';

  long long count = 0, rows = 0, cols = -1, row_cols = 0;
  const char* p = data;
  const char* end = data + sz;

  while (p < end) {
    // parse one number (strtod handles +-, exponents, inf/nan)
    char* next = nullptr;
    double v = std::strtod(p, &next);
    if (next == p) {  // empty field (e.g. ",,") — treat as 0
      v = 0.0;
      next = const_cast<char*>(p);
    }
    if (buf) {
      if (count >= capacity) { std::free(data); return -3; }
      buf[count] = v;
    }
    ++count;
    ++row_cols;
    p = next;
    // skip to delimiter
    while (p < end && *p != ',' && *p != '\n' && *p != '\r') ++p;
    if (p >= end || *p == '\n' || *p == '\r') {
      while (p < end && (*p == '\n' || *p == '\r')) ++p;
      ++rows;
      if (cols < 0) cols = row_cols;
      else if (row_cols != cols && row_cols != 0) { std::free(data); return -2; }
      row_cols = 0;
    } else {
      ++p;  // skip comma
    }
  }
  if (row_cols > 0) {  // file without trailing newline
    ++rows;
    if (cols < 0) cols = row_cols;
    else if (row_cols != cols) { std::free(data); return -2; }
  }
  std::free(data);
  if (out_rows) *out_rows = rows;
  if (out_cols) *out_cols = cols < 0 ? 0 : cols;
  return count;
}

}  // extern "C"
