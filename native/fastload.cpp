// Fast tagged-record dataset tokenizer — the native-runtime counterpart of
// GTSAM's C++ dataset readers (reference: gtsam/slam/dataset.cpp, used by
// gpslam's example loaders; SURVEY.md §2.1 G12 / L8). Python loaders in
// gpslam_tpu/io/formats.py call this through ctypes and fall back to
// pure-Python parsing when unavailable.
//
// Model: a text file of whitespace-separated records, one per line, whose
// first token is a string tag (e.g. "VERTEX_SE2", "EDGE_SE3:QUAT", "TD");
// all remaining tokens are numeric. Two-pass C ABI:
//
//   int fl_count(const char* path, const char* tags /* '\n'-joined */,
//                int64 ntags, int64* counts /* out, per tag */);
//   int fl_fill(const char* path, const char* tags, int64 ntags,
//               int64 ncols, double** bufs /* per tag, counts[t]*ncols */,
//               int64* rows /* out, rows written per tag */);
//
// fl_fill writes up to ncols numeric fields per record (missing fields stay
// untouched — callers pre-zero the buffers). Returns 0 on success, nonzero
// on IO error. Everything is single-pass over an in-memory copy of the
// file; parsing uses strtod on a NUL-padded buffer.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

bool read_all(const char* path, std::string& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n) + 1);
  size_t got = std::fread(&out[0], 1, static_cast<size_t>(n), f);
  std::fclose(f);
  out.resize(got);
  out.push_back('\0');
  return true;
}

std::vector<std::string> split_tags(const char* tags, std::int64_t ntags) {
  std::vector<std::string> out;
  const char* p = tags;
  for (std::int64_t t = 0; t < ntags; ++t) {
    const char* q = std::strchr(p, '\n');
    if (!q) q = p + std::strlen(p);
    out.emplace_back(p, q);
    p = (*q == '\n') ? q + 1 : q;
  }
  return out;
}

inline bool is_ws(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// Match the tag at line start; returns tag index or -1.
inline std::int64_t match_tag(const char* s, const char* e,
                              const std::vector<std::string>& tags) {
  const char* q = s;
  while (q < e && !is_ws(*q)) ++q;
  size_t len = static_cast<size_t>(q - s);
  for (size_t t = 0; t < tags.size(); ++t)
    if (tags[t].size() == len && std::memcmp(tags[t].data(), s, len) == 0)
      return static_cast<std::int64_t>(t);
  return -1;
}

template <class F>
int scan(const char* path, const char* tags_str, std::int64_t ntags, F&& f) {
  std::string buf;
  if (!read_all(path, buf)) return 1;
  auto tags = split_tags(tags_str, ntags);
  char* s = &buf[0];
  char* end = s + buf.size() - 1;  // before the trailing NUL
  while (s < end) {
    char* e = static_cast<char*>(std::memchr(s, '\n', end - s));
    if (!e) e = end;
    while (s < e && is_ws(*s)) ++s;
    if (s < e) {
      std::int64_t t = match_tag(s, e, tags);
      if (t >= 0) {
        char saved = *e;
        *e = '\0';  // bound strtod to this line
        const char* p = s;
        while (p < e && !is_ws(*p)) ++p;  // skip the tag token
        f(t, p, e);
        *e = saved;
      }
    }
    s = e + 1;
  }
  return 0;
}

}  // namespace

extern "C" {

int fl_count(const char* path, const char* tags, std::int64_t ntags,
             std::int64_t* counts) {
  for (std::int64_t t = 0; t < ntags; ++t) counts[t] = 0;
  return scan(path, tags, ntags,
              [&](std::int64_t t, const char*, const char*) { ++counts[t]; });
}

int fl_fill(const char* path, const char* tags, std::int64_t ntags,
            std::int64_t ncols, double** bufs, std::int64_t* rows) {
  for (std::int64_t t = 0; t < ntags; ++t) rows[t] = 0;
  return scan(path, tags, ntags,
              [&](std::int64_t t, const char* p, const char* e) {
                double* dst = bufs[t] + rows[t] * ncols;
                std::int64_t c = 0;
                while (c < ncols) {
                  char* next = nullptr;
                  double v = std::strtod(p, &next);
                  if (next == p) break;  // no more numeric fields
                  dst[c++] = v;
                  p = next;
                  if (p >= e) break;
                }
                ++rows[t];
              });
}

}  // extern "C"
