// Native data-loading runtime for sequential_monte_carlo_tpu.
//
// The reference loads its observation series at example run time via an HTTP
// FRED client (examples/inflation_example.jl:12-23). The TPU framework's
// data path is a native loader instead: a mmap-based CSV column reader that
// parses numeric columns branch-prediction-friendly and returns contiguous
// float64 buffers ready for jnp.asarray — no Python-level row loop. Exposed
// through ctypes (sequential_monte_carlo_tpu/utils/dataio.py) with a pure-
// Python fallback when the shared library is absent.
//
// Build: make -C csrc   (produces csrc/libsmcdataio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Count data rows (excluding header) and columns of a delimited file.
// Returns 0 on success.
int smc_csv_dims(const char* path, char delim, int64_t* n_rows,
                 int64_t* n_cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return 1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return 2; }
  size_t len = (size_t)st.st_size;
  if (len == 0) { close(fd); *n_rows = 0; *n_cols = 0; return 0; }
  const char* data =
      (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  if (data == MAP_FAILED) { close(fd); return 3; }

  int64_t rows = 0, cols = 1;
  // header: count columns
  size_t i = 0;
  for (; i < len && data[i] != '\n'; ++i)
    if (data[i] == delim) ++cols;
  // body: count newlines with content
  bool line_has_content = false;
  for (++i; i < len; ++i) {
    if (data[i] == '\n') {
      if (line_has_content) ++rows;
      line_has_content = false;
    } else if (data[i] != '\r') {
      line_has_content = true;
    }
  }
  if (line_has_content) ++rows;

  munmap((void*)data, len);
  close(fd);
  *n_rows = rows;
  *n_cols = cols;
  return 0;
}

// Parse one numeric column (0-indexed) of a delimited file with a header
// row into out[n_rows]. Non-numeric cells parse as NaN. Returns 0 on
// success.
int smc_csv_read_column(const char* path, char delim, int64_t col,
                        double* out, int64_t n_rows) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return 1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return 2; }
  size_t len = (size_t)st.st_size;
  const char* data =
      (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  if (data == MAP_FAILED) { close(fd); return 3; }

  size_t i = 0;
  while (i < len && data[i] != '\n') ++i;  // skip header
  ++i;

  int64_t row = 0;
  while (i < len && row < n_rows) {
    // find the target column on this line
    int64_t c = 0;
    size_t field_start = i;
    while (i <= len) {
      bool at_end = (i == len) || data[i] == '\n';
      if (at_end || data[i] == delim) {
        if (c == col) {
          char buf[64];
          size_t flen = i - field_start;
          if (flen >= sizeof(buf)) flen = sizeof(buf) - 1;
          memcpy(buf, data + field_start, flen);
          buf[flen] = '\0';
          char* endp = nullptr;
          double v = strtod(buf, &endp);
          out[row] = (endp == buf) ? __builtin_nan("") : v;
        }
        ++c;
        field_start = i + 1;
      }
      if (at_end) break;
      ++i;
    }
    // advance past newline
    while (i < len && data[i] != '\n') ++i;
    ++i;
    ++row;
  }

  munmap((void*)data, len);
  close(fd);
  return row == n_rows ? 0 : 4;
}

}  // extern "C"
