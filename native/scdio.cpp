// scdio — native archive reader and batch packer for the SCD training
// pipeline.
//
// The reference framework's input path was pure Python: zip extraction to a
// temp dir, per-file numpy.load into a Python list, and per-sample tensor
// work inside Dataset.__getitem__ (reference: datasets/scds/scdx16p100.py:
// 95-134, 304-379). This library is the TPU framework's native host-side
// counterpart: it memory-maps a `.d` zip, parses the central directory,
// inflates npy payloads straight into caller-provided contiguous buffers
// (multi-threaded), and packs shuffled training batches with C memcpy
// speed. Exposed as a C ABI for ctypes (no pybind11 dependency).
//
// Supported subset: zip entries stored (method 0) or deflated (method 8),
// npy format v1.x, little-endian f4/f8 arrays.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

struct Entry {
  std::string name;
  uint64_t compressed_size = 0;
  uint64_t uncompressed_size = 0;
  uint64_t header_offset = 0;
  uint16_t method = 0;
};

struct Archive {
  int fd = -1;
  const uint8_t *map = nullptr;
  size_t size = 0;
  std::vector<Entry> entries;
};

uint16_t rd16(const uint8_t *p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t *p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}

// locate the end-of-central-directory record (scan back over the comment)
bool find_eocd(const uint8_t *map, size_t size, size_t *cd_offset,
               size_t *cd_count) {
  if (size < 22) return false;
  size_t max_back = size < (22 + 65535) ? size : (22 + 65535);
  for (size_t back = 22; back <= max_back; back++) {
    const uint8_t *p = map + size - back;
    if (rd32(p) == 0x06054b50) {
      *cd_count = rd16(p + 10);
      *cd_offset = rd32(p + 16);
      return true;
    }
  }
  return false;
}

bool parse_central_directory(Archive *ar) {
  size_t cd_offset, cd_count;
  if (!find_eocd(ar->map, ar->size, &cd_offset, &cd_count)) return false;
  if (cd_offset >= ar->size) return false;
  const uint8_t *p = ar->map + cd_offset;
  const uint8_t *end = ar->map + ar->size;
  for (size_t i = 0; i < cd_count; i++) {
    // every field read below must stay inside the mapping — a corrupt
    // archive returns false so the caller falls back to the Python reader
    if (p + 46 > end || rd32(p) != 0x02014b50) return false;
    Entry e;
    e.method = rd16(p + 10);
    e.compressed_size = rd32(p + 20);
    e.uncompressed_size = rd32(p + 24);
    uint16_t name_len = rd16(p + 28);
    uint16_t extra_len = rd16(p + 30);
    uint16_t comment_len = rd16(p + 32);
    e.header_offset = rd32(p + 42);
    if (p + 46 + name_len + extra_len + comment_len > end) return false;
    if (e.header_offset + 30 > ar->size) return false;
    e.name.assign(reinterpret_cast<const char *>(p + 46), name_len);
    ar->entries.push_back(std::move(e));
    p += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

// data offset: skip the local file header at entry.header_offset
const uint8_t *entry_data(const Archive *ar, const Entry &e) {
  if (e.header_offset + 30 > ar->size) return nullptr;
  const uint8_t *p = ar->map + e.header_offset;
  if (rd32(p) != 0x04034b50) return nullptr;
  uint16_t name_len = rd16(p + 26);
  uint16_t extra_len = rd16(p + 28);
  uint64_t data_off = e.header_offset + 30 + name_len + extra_len;
  if (data_off + e.compressed_size > ar->size) return nullptr;
  return ar->map + data_off;
}

bool inflate_entry(const Archive *ar, const Entry &e, uint8_t *out) {
  const uint8_t *src = entry_data(ar, e);
  if (!src) return false;
  if (e.method == 0) {
    memcpy(out, src, e.uncompressed_size);
    return true;
  }
  if (e.method != 8) return false;
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t *>(src);
  zs.avail_in = (uInt)e.compressed_size;
  zs.next_out = out;
  zs.avail_out = (uInt)e.uncompressed_size;
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || (ret == Z_OK && zs.avail_out == 0);
}

// parse an npy v1.x header inside `buf`; returns data pointer, fills shape
const uint8_t *parse_npy(const uint8_t *buf, size_t size, int64_t *shape,
                         int *ndim, int *is_f8) {
  if (size < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) return nullptr;
  uint16_t header_len = rd16(buf + 8);
  std::string header(reinterpret_cast<const char *>(buf + 10), header_len);
  *is_f8 = header.find("<f8") != std::string::npos ? 1 : 0;
  if (!*is_f8 && header.find("<f4") == std::string::npos) return nullptr;
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return nullptr;
  size_t lp = header.find('(', sp);
  size_t rp = header.find(')', lp);
  std::string dims = header.substr(lp + 1, rp - lp - 1);
  *ndim = 0;
  const char *cursor = dims.c_str();
  while (*cursor && *ndim < 4) {
    while (*cursor == ' ' || *cursor == ',') cursor++;
    if (!*cursor) break;
    shape[(*ndim)++] = strtoll(cursor, const_cast<char **>(&cursor), 10);
  }
  return buf + 10 + header_len;
}

void copy_npy_floats(const uint8_t *data, int is_f8, int64_t count,
                     float *out) {
  if (is_f8) {
    const double *src = reinterpret_cast<const double *>(data);
    for (int64_t i = 0; i < count; i++) out[i] = (float)src[i];
  } else {
    memcpy(out, data, count * sizeof(float));
  }
}

}  // namespace

extern "C" {

void *scdio_open(const char *path) {
  Archive *ar = new Archive();
  ar->fd = open(path, O_RDONLY);
  if (ar->fd < 0) {
    delete ar;
    return nullptr;
  }
  struct stat st;
  fstat(ar->fd, &st);
  ar->size = st.st_size;
  ar->map = static_cast<const uint8_t *>(
      mmap(nullptr, ar->size, PROT_READ, MAP_PRIVATE, ar->fd, 0));
  if (ar->map == MAP_FAILED || !parse_central_directory(ar)) {
    if (ar->map != MAP_FAILED) munmap(const_cast<uint8_t *>(ar->map), ar->size);
    close(ar->fd);
    delete ar;
    return nullptr;
  }
  return ar;
}

void scdio_close(void *handle) {
  Archive *ar = static_cast<Archive *>(handle);
  if (!ar) return;
  munmap(const_cast<uint8_t *>(ar->map), ar->size);
  close(ar->fd);
  delete ar;
}

// number of entries under samples/
int64_t scdio_num_samples(void *handle) {
  Archive *ar = static_cast<Archive *>(handle);
  int64_t n = 0;
  for (const auto &e : ar->entries)
    if (e.name.rfind("samples/", 0) == 0) n++;
  return n;
}

// read one named entry, inflated, into `out` (caller sizes it from the
// central directory via scdio_entry_size)
int64_t scdio_entry_size(void *handle, const char *name) {
  Archive *ar = static_cast<Archive *>(handle);
  for (const auto &e : ar->entries)
    if (e.name == name) return (int64_t)e.uncompressed_size;
  return -1;
}

int scdio_read_entry(void *handle, const char *name, uint8_t *out) {
  Archive *ar = static_cast<Archive *>(handle);
  for (const auto &e : ar->entries)
    if (e.name == name) return inflate_entry(ar, e, out) ? 0 : -2;
  return -1;
}

// Load every samples/<name>.npy (in the order given by `names`, a
// NUL-separated list of `count` full entry names) into one contiguous
// (count, H, W) float32 buffer, and every locs/<name>.npy into a
// (count, maxtag, 8) float32 buffer (zero padded) + (count,) int32 counts.
// Runs with `threads` worker threads. Returns 0 on success.
int scdio_load_dataset(void *handle, const char *names, int64_t count,
                       int64_t hw, int64_t maxtag, float *samples_out,
                       float *locs_out, int32_t *counts_out, int threads) {
  Archive *ar = static_cast<Archive *>(handle);

  // hash-index the requested names for O(entries + count) matching
  std::unordered_map<std::string, int64_t> name_index;
  name_index.reserve(count * 2);
  const char *cursor = names;
  for (int64_t i = 0; i < count; i++) {
    name_index.emplace(cursor, i);
    cursor += strlen(cursor) + 1;
  }

  std::vector<const Entry *> sample_entries(count, nullptr);
  std::vector<const Entry *> loc_entries(count, nullptr);
  for (const auto &e : ar->entries) {
    bool is_sample = e.name.rfind("samples/", 0) == 0;
    bool is_loc = e.name.rfind("locs/", 0) == 0;
    if (!is_sample && !is_loc) continue;
    auto it = name_index.find(e.name.substr(is_sample ? 8 : 5));
    if (it != name_index.end())
      (is_sample ? sample_entries : loc_entries)[it->second] = &e;
  }

  std::vector<int> errors(count, 0);
  auto worker = [&](int64_t begin, int64_t end) {
    std::vector<uint8_t> scratch;
    for (int64_t i = begin; i < end; i++) {
      const Entry *se = sample_entries[i];
      const Entry *le = loc_entries[i];
      if (!se || !le) {
        errors[i] = 1;
        continue;
      }
      // sample
      scratch.resize(se->uncompressed_size);
      if (!inflate_entry(ar, *se, scratch.data())) {
        errors[i] = 2;
        continue;
      }
      int64_t shape[4];
      int ndim, is_f8;
      const uint8_t *data =
          parse_npy(scratch.data(), scratch.size(), shape, &ndim, &is_f8);
      if (!data || ndim != 2 || shape[0] * shape[1] != hw) {
        errors[i] = 3;
        continue;
      }
      copy_npy_floats(data, is_f8, hw, samples_out + i * hw);
      // locs
      scratch.resize(le->uncompressed_size);
      if (!inflate_entry(ar, *le, scratch.data())) {
        errors[i] = 4;
        continue;
      }
      data = parse_npy(scratch.data(), scratch.size(), shape, &ndim, &is_f8);
      int64_t k = 0;
      if (data && ndim == 2 && shape[1] == 8) {
        k = shape[0] < maxtag ? shape[0] : maxtag;
        copy_npy_floats(data, is_f8, k * 8, locs_out + i * maxtag * 8);
      } else if (data && ndim == 1 && shape[0] == 0) {
        k = 0;  // empty clip saved as a 1-D empty array
      } else {
        // anything else (wrong column count, >2 dims, parse failure) is an
        // error — silently dropping labels would corrupt training
        errors[i] = 5;
        continue;
      }
      counts_out[i] = (int32_t)k;
    }
  };

  if (threads <= 1) {
    worker(0, count);
  } else {
    std::vector<std::thread> pool;
    int64_t chunk = (count + threads - 1) / threads;
    for (int t = 0; t < threads; t++) {
      int64_t begin = t * chunk;
      int64_t end = begin + chunk < count ? begin + chunk : count;
      if (begin >= end) break;
      pool.emplace_back(worker, begin, end);
    }
    for (auto &th : pool) th.join();
  }

  for (int64_t i = 0; i < count; i++)
    if (errors[i]) return -(int)(i + 1);
  return 0;
}

// pack a shuffled batch: out[b] = samples[indices[b]]
void scdio_gather_batch(const float *samples, int64_t hw,
                        const int64_t *indices, int64_t batch, float *out) {
  for (int64_t b = 0; b < batch; b++)
    memcpy(out + b * hw, samples + indices[b] * hw, hw * sizeof(float));
}

// inference grayscale (test.py:21-33): one fused pass over interleaved
// RGB, BIT-EXACT to the numpy reference path — double arithmetic in the
// same association order ((0.1140*r + 0.5870*g) + 0.2989*b) and
// nearbyint under the default FE_TONEAREST rounding = numpy.round's
// round-half-even. Requires -ffp-contract=off (Makefile): GCC's default
// FMA contraction would change the double rounding on some pixels.
// numpy runs this as 5+ strided float64 passes (~130 ms for a 3092x2056
// slide on this host); the fused loop is memory-bound at ~25 MB traffic.
void scdio_grayscale_u8(const uint8_t *rgb, int64_t n_px, uint8_t *out) {
  for (int64_t i = 0; i < n_px; i++) {
    const double r = rgb[3 * i];
    const double g = rgb[3 * i + 1];
    const double b = rgb[3 * i + 2];
    out[i] = (uint8_t)std::nearbyint(0.1140 * r + 0.5870 * g + 0.2989 * b);
  }
}

}  // extern "C"
