// Native IO runtime for denseslam_tpu.
//
// Role: the data-loading layer the reference implements natively (pfmLib's
// PFM IO — reference: src/pfmLib/ImageIOpfm.cpp — plus OpenCV imread/imwrite
// in Input/PrecomputedDepthProvider). Implemented from scratch: a minimal
// PNG codec (zlib-based, the subset SLAM datasets use: 8-bit gray, 16-bit
// gray, 8/24-bit RGB, non-interlaced), PFM read/write, and a multithreaded
// prefetching frame loader that hides disk latency behind compute — the
// host-side analogue of the reference's async input handling.
//
// C ABI only (consumed from Python via ctypes; no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PFM
// ---------------------------------------------------------------------------

// Reads a PFM file. Returns 0 on success. Fills w, h, channels; caller frees
// *data with dsio_free. Output rows are top-down, float32.
int dsio_read_pfm(const char* path, float** data, int* w, int* h, int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char header[3] = {0};
  if (fscanf(f, "%2s", header) != 1) { fclose(f); return -2; }
  int ch;
  if (strcmp(header, "PF") == 0) ch = 3;
  else if (strcmp(header, "Pf") == 0) ch = 1;
  else { fclose(f); return -3; }
  int ww, hh;
  double scale;
  if (fscanf(f, "%d %d %lf", &ww, &hh, &scale) != 3) { fclose(f); return -4; }
  fgetc(f);  // single whitespace after header
  size_t n = (size_t)ww * hh * ch;
  float* buf = (float*)malloc(n * sizeof(float));
  if (fread(buf, sizeof(float), n, f) != n) { free(buf); fclose(f); return -5; }
  fclose(f);
  bool little = scale < 0;
  // byte-swap if file endianness differs from host (host assumed little)
  if (!little) {
    uint8_t* b = (uint8_t*)buf;
    for (size_t i = 0; i < n; i++) {
      std::swap(b[4 * i + 0], b[4 * i + 3]);
      std::swap(b[4 * i + 1], b[4 * i + 2]);
    }
  }
  // PFM rows are bottom-up: flip vertically
  float* out = (float*)malloc(n * sizeof(float));
  size_t row = (size_t)ww * ch;
  for (int y = 0; y < hh; y++)
    memcpy(out + (size_t)y * row, buf + (size_t)(hh - 1 - y) * row,
           row * sizeof(float));
  free(buf);
  double s = scale < 0 ? -scale : scale;
  if (s != 0.0 && s != 1.0)
    for (size_t i = 0; i < n; i++) out[i] *= (float)s;
  *data = out;
  *w = ww;
  *h = hh;
  *channels = ch;
  return 0;
}

int dsio_write_pfm(const char* path, const float* data, int w, int h,
                   int channels) {
  if (channels != 1 && channels != 3) return -1;
  FILE* f = fopen(path, "wb");
  if (!f) return -2;
  fprintf(f, "%s\n%d %d\n-1.0\n", channels == 3 ? "PF" : "Pf", w, h);
  size_t row = (size_t)w * channels;
  for (int y = h - 1; y >= 0; y--)
    fwrite(data + (size_t)y * row, sizeof(float), row, f);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG (subset: 8/16-bit gray, 8-bit RGB/RGBA, non-interlaced)
// ---------------------------------------------------------------------------

static uint32_t rd_u32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | p[3];
}

static void wr_u32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decodes a PNG. On success fills a malloc'd uint16 buffer (all depths
// widened to u16 for a uniform ABI), w, h, channels, bitdepth. Returns 0.
int dsio_read_png(const char* path, uint16_t** data, int* w, int* h,
                  int* channels, int* bitdepth) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> file((size_t)fsize);
  if (fread(file.data(), 1, fsize, f) != (size_t)fsize) { fclose(f); return -2; }
  fclose(f);
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (fsize < 8 || memcmp(file.data(), sig, 8) != 0) return -3;

  size_t pos = 8;
  int ww = 0, hh = 0, depth = 0, color = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= (size_t)fsize) {
    uint32_t len = rd_u32(&file[pos]);
    const char* type = (const char*)&file[pos + 4];
    const uint8_t* body = &file[pos + 8];
    if (memcmp(type, "IHDR", 4) == 0) {
      ww = rd_u32(body);
      hh = rd_u32(body + 4);
      depth = body[8];
      color = body[9];
      interlace = body[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (ww <= 0 || hh <= 0 || interlace != 0) return -4;
  int ch;
  switch (color) {
    case 0: ch = 1; break;   // gray
    case 2: ch = 3; break;   // rgb
    case 4: ch = 2; break;   // gray+alpha
    case 6: ch = 4; break;   // rgba
    default: return -5;      // palette unsupported
  }
  if (depth != 8 && depth != 16) return -6;

  int bpp = ch * depth / 8;                    // bytes per pixel
  size_t stride = (size_t)ww * bpp;            // bytes per row (no filter byte)
  std::vector<uint8_t> raw((stride + 1) * hh);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return -7;

  // unfilter in place into `img`
  std::vector<uint8_t> img(stride * hh);
  for (int y = 0; y < hh; y++) {
    uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* dst = &img[stride * y];
    const uint8_t* up = y > 0 ? &img[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= (size_t)bpp ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= (size_t)bpp) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -8;
      }
      dst[x] = (uint8_t)v;
    }
  }

  size_t n = (size_t)ww * hh * ch;
  uint16_t* out = (uint16_t*)malloc(n * sizeof(uint16_t));
  if (depth == 8) {
    for (size_t i = 0; i < n; i++) out[i] = img[i];
  } else {
    for (size_t i = 0; i < n; i++)
      out[i] = ((uint16_t)img[2 * i] << 8) | img[2 * i + 1];  // big-endian
  }
  *data = out;
  *w = ww;
  *h = hh;
  *channels = ch;
  *bitdepth = depth;
  return 0;
}

static void png_write_chunk(std::vector<uint8_t>& out, const char* type,
                            const uint8_t* body, size_t len) {
  uint8_t hdr[8];
  wr_u32(hdr, (uint32_t)len);
  memcpy(hdr + 4, type, 4);
  out.insert(out.end(), hdr, hdr + 8);
  if (len) out.insert(out.end(), body, body + len);
  uLong crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, (const Bytef*)type, 4);
  if (len) crc = crc32(crc, body, len);
  uint8_t crcb[4];
  wr_u32(crcb, (uint32_t)crc);
  out.insert(out.end(), crcb, crcb + 4);
}

// Writes a PNG: data is uint16 (values must fit `bitdepth`), channels 1 or 3.
int dsio_write_png(const char* path, const uint16_t* data, int w, int h,
                   int channels, int bitdepth) {
  if ((channels != 1 && channels != 3) || (bitdepth != 8 && bitdepth != 16))
    return -1;
  int bpp = channels * bitdepth / 8;
  size_t stride = (size_t)w * bpp;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; y++) {
    raw[(stride + 1) * y] = 0;  // filter: none
    uint8_t* dst = &raw[(stride + 1) * y + 1];
    const uint16_t* src = data + (size_t)y * w * channels;
    if (bitdepth == 8) {
      for (int i = 0; i < w * channels; i++) dst[i] = (uint8_t)src[i];
    } else {
      for (int i = 0; i < w * channels; i++) {
        dst[2 * i] = src[i] >> 8;        // big-endian
        dst[2 * i + 1] = src[i] & 0xFF;
      }
    }
  }
  uLongf comp_len = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_len);
  if (compress2(comp.data(), &comp_len, raw.data(), raw.size(), 6) != Z_OK)
    return -2;

  std::vector<uint8_t> out;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  wr_u32(ihdr, w);
  wr_u32(ihdr + 4, h);
  ihdr[8] = (uint8_t)bitdepth;
  ihdr[9] = channels == 3 ? 2 : 0;
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  png_write_chunk(out, "IHDR", ihdr, 13);
  png_write_chunk(out, "IDAT", comp.data(), comp_len);
  png_write_chunk(out, "IEND", nullptr, 0);

  FILE* f = fopen(path, "wb");
  if (!f) return -3;
  fwrite(out.data(), 1, out.size(), f);
  fclose(f);
  return 0;
}

void dsio_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Prefetching frame loader
// ---------------------------------------------------------------------------
// Reads frames (PNG or PFM) ahead of the consumer on worker threads. The
// per-frame decode result is exposed as float32 buffers.

struct Frame {
  int index = -1;
  std::vector<float> data;  // decoded, float32
  int w = 0, h = 0, ch = 0;
  int status = -1;
};

struct Loader {
  std::vector<std::string> paths;
  int next_submit = 0;
  int next_consume = 0;
  size_t ahead;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::queue<int> work;
  std::condition_variable cv_work;
  std::vector<Frame> ready;      // indexed by frame index
  std::vector<bool> done;
  std::vector<std::thread> workers;
  bool stop = false;

  Loader(size_t ahead_, int n_threads) : ahead(ahead_) {
    for (int i = 0; i < n_threads; i++)
      workers.emplace_back([this] { this->run(); });
  }

  static int decode(const std::string& p, Frame* fr) {
    size_t n = p.size();
    if (n > 4 && p.substr(n - 4) == ".pfm") {
      float* d;
      int w, h, ch;
      int rc = dsio_read_pfm(p.c_str(), &d, &w, &h, &ch);
      if (rc != 0) return rc;
      fr->data.assign(d, d + (size_t)w * h * ch);
      fr->w = w; fr->h = h; fr->ch = ch;
      dsio_free(d);
      return 0;
    }
    uint16_t* d;
    int w, h, ch, depth;
    int rc = dsio_read_png(p.c_str(), &d, &w, &h, &ch, &depth);
    if (rc != 0) return rc;
    size_t cnt = (size_t)w * h * ch;
    fr->data.resize(cnt);
    for (size_t i = 0; i < cnt; i++) fr->data[i] = (float)d[i];
    fr->w = w; fr->h = h; fr->ch = ch;
    dsio_free(d);
    return 0;
  }

  void run() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !work.empty(); });
        if (stop) return;
        idx = work.front();
        work.pop();
      }
      Frame fr;
      fr.index = idx;
      fr.status = decode(paths[idx], &fr);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready[idx] = std::move(fr);
        done[idx] = true;
      }
      cv_ready.notify_all();
    }
  }

  void submit_upto(int limit) {
    std::lock_guard<std::mutex> lk(mu);
    while (next_submit < (int)paths.size() && next_submit < limit) {
      work.push(next_submit++);
    }
    cv_work.notify_all();
  }
};

void* dsio_loader_create(const char** paths, int n, int ahead, int threads) {
  Loader* l = new Loader((size_t)ahead, threads);
  l->paths.assign(paths, paths + n);
  l->ready.resize(n);
  l->done.assign(n, false);
  l->submit_upto(ahead);
  return l;
}

// Blocks until the next frame is decoded. Returns its status (0 = ok, <0 =
// decode error, 1 = end of stream). Caller copies out of the returned view
// before the next call.
int dsio_loader_next(void* lp, const float** data, int* w, int* h, int* ch) {
  Loader* l = (Loader*)lp;
  if (l->next_consume >= (int)l->paths.size()) return 1;
  int idx = l->next_consume++;
  l->submit_upto(idx + 1 + (int)l->ahead);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_ready.wait(lk, [l, idx] { return l->done[idx]; });
  Frame& fr = l->ready[idx];
  *data = fr.data.data();
  *w = fr.w;
  *h = fr.h;
  *ch = fr.ch;
  return fr.status;
}

void dsio_loader_destroy(void* lp) {
  Loader* l = (Loader*)lp;
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_work.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
