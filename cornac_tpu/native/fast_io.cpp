// Native data-loader fast path (SURVEY §2.2 "C++ host-side utilities").
//
// The reference framework's native layer is Cython/C++ compute kernels; in
// this framework the compute path is JAX/XLA, and the native layer serves
// the host side instead: bulk tokenization + numeric parsing for the
// Reader's delimited rating files, which at Netflix scale (100M lines) is
// the slowest purely-host stage of a run. Bound via ctypes
// (cornac_tpu/data/fast_reader.py); everything degrades to the pure-Python
// parser when the shared object is unavailable.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// Tokenize a delimited text buffer. For each row, writes n_cols
// (offset, length) pairs describing the fields. Rows with a different
// field count abort the fast path (return -1 - row_index). Handles
// trailing newline-less last lines and \r\n endings.
int64_t tokenize_table(const char* buf, int64_t n, char sep, int32_t n_cols,
                       int64_t max_rows, int64_t* offsets, int32_t* lengths) {
    int64_t row = 0;
    int64_t pos = 0;
    while (pos < n && row < max_rows) {
        // find end of line
        int64_t eol = pos;
        while (eol < n && buf[eol] != '\n') eol++;
        int64_t line_end = eol;
        if (line_end > pos && buf[line_end - 1] == '\r') line_end--;
        // leading/trailing blanks would be stripped by the Python parser's
        // line.strip(); bail out so the fallback handles such files
        if (line_end > pos &&
            (buf[pos] == ' ' || buf[pos] == '\t' ||
             buf[line_end - 1] == ' ' || buf[line_end - 1] == '\t')) {
            return -1 - row;
        }
        if (line_end > pos) {  // skip blank lines, like str.splitlines+filter
            int32_t col = 0;
            int64_t field_start = pos;
            for (int64_t i = pos; i <= line_end; ++i) {
                if (i == line_end || buf[i] == sep) {
                    if (col >= n_cols) return -1 - row;
                    offsets[row * n_cols + col] = field_start;
                    lengths[row * n_cols + col] = (int32_t)(i - field_start);
                    field_start = i + 1;
                    col++;
                }
            }
            if (col < n_cols) return -1 - row;
            row++;
        }
        pos = eol + 1;
    }
    return row;
}

// Parse one tokenized column as double (strtod on bounded copies).
// Returns 0 on success, -1 - row_index on the first unparsable field.
int64_t parse_double_column(const char* buf, const int64_t* offsets,
                            const int32_t* lengths, int64_t n_rows,
                            int32_t n_cols, int32_t col, double* out) {
    char tmp[64];
    for (int64_t r = 0; r < n_rows; ++r) {
        int64_t off = offsets[r * n_cols + col];
        int32_t len = lengths[r * n_cols + col];
        if (len <= 0 || len >= (int32_t)sizeof(tmp)) return -1 - r;
        memcpy(tmp, buf + off, (size_t)len);
        tmp[len] = '\0';
        char* end = nullptr;
        out[r] = strtod(tmp, &end);
        if (end != tmp + len) return -1 - r;
    }
    return 0;
}

}  // extern "C"
