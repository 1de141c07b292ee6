// Fast grid CSV I/O (the reference runtime's hot host path: readGridCSV /
// writeCSVGrid parse 12.8M-cell matrices).  Single pass, strtod-based, with
// 'nan'/blank-cell handling matching test_gebco.cpp:19-40 (blank rows become
// full NaN rows of the established width).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

struct CsvGrid {
  std::vector<double> data;
  int64_t rows = 0;
  int64_t cols = 0;
};

CsvGrid* parse(const char* buf, size_t len) {
  auto* g = new CsvGrid();
  const char* p = buf;
  const char* end = buf + len;
  std::vector<double> row;
  while (p < end) {
    row.clear();
    // one line
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* q = p;
    while (q < line_end) {
      // one cell
      const char* cell_end = static_cast<const char*>(memchr(q, ',', line_end - q));
      if (!cell_end) cell_end = line_end;
      // skip whitespace
      const char* s = q;
      while (s < cell_end && isspace(static_cast<unsigned char>(*s))) ++s;
      if (s == cell_end) {
        // empty cell: reference skips them (readGridCSV pushes only non-empty)
      } else {
        char* conv_end = nullptr;
        double v = strtod(s, &conv_end);
        if (conv_end == s) v = std::numeric_limits<double>::quiet_NaN();
        row.push_back(v);
      }
      q = cell_end + 1;
    }
    if (row.empty() && g->rows > 0) {
      // blank line -> full NaN row of established width (test_gebco.cpp:34-36)
      row.assign(g->cols, std::numeric_limits<double>::quiet_NaN());
    }
    if (!row.empty()) {
      if (g->rows == 0) g->cols = static_cast<int64_t>(row.size());
      if (static_cast<int64_t>(row.size()) != g->cols) {
        delete g;
        return nullptr;  // ragged
      }
      g->data.insert(g->data.end(), row.begin(), row.end());
      ++g->rows;
    }
    p = line_end + 1;
  }
  return g;
}

}  // namespace

extern "C" {

// Returns an opaque handle (or null).  Query dims, copy out, then free.
void* auv_csv_read(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(sz), '\0');
  size_t rd = fread(buf.data(), 1, static_cast<size_t>(sz), f);
  fclose(f);
  if (rd != static_cast<size_t>(sz)) return nullptr;
  return parse(buf.data(), buf.size());
}

int64_t auv_csv_rows(void* h) { return h ? static_cast<CsvGrid*>(h)->rows : -1; }
int64_t auv_csv_cols(void* h) { return h ? static_cast<CsvGrid*>(h)->cols : -1; }

void auv_csv_copy(void* h, double* out) {
  auto* g = static_cast<CsvGrid*>(h);
  memcpy(out, g->data.data(), g->data.size() * sizeof(double));
}

void auv_csv_free(void* h) { delete static_cast<CsvGrid*>(h); }

// Write a row-major grid; NaN rendered as 'nan' (subset_bathymetry na_rep).
int auv_csv_write(const char* path, const double* data, int64_t rows, int64_t cols) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  std::string line;
  char tmp[64];
  for (int64_t r = 0; r < rows; ++r) {
    line.clear();
    for (int64_t c = 0; c < cols; ++c) {
      double v = data[r * cols + c];
      if (std::isnan(v)) {
        line += "nan";
      } else {
        int n = snprintf(tmp, sizeof tmp, "%.17g", v);
        // trim to shortest round-trip-ish: try %g first
        int n2 = snprintf(tmp, sizeof tmp, "%.12g", v);
        double back = strtod(tmp, nullptr);
        if (back != v) n2 = snprintf(tmp, sizeof tmp, "%.17g", v);
        (void)n;
        line.append(tmp, static_cast<size_t>(n2));
      }
      if (c + 1 < cols) line += ',';
    }
    line += '\n';
    if (fwrite(line.data(), 1, line.size(), f) != line.size()) {
      fclose(f);
      return -1;
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
