// Native serving I/O runtime: wire-protocol codec + image conversion.
//
// The TPU framework's counterpart of the native runtime pieces the
// reference gets from TensorRT/CUDA glue: the per-stamp byte path
// (decode request header -> validate -> expose a zero-copy image view;
// encode response header) and the uint8<->float image conversions and
// alpha compositing that sit between the websocket and the device
// program. Exposed as a plain C ABI consumed from Python via ctypes
// (no pybind11 dependency); diffusiontexturepainting_tpu/serving/
// native_io.py falls back to numpy when the library is not built.
//
// Build: make -C native   (produces native/libdtpio.so)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

typedef struct {
  uint8_t type;
  uint8_t steps;
  uint8_t context_pad;
  uint8_t tg_steps;
  uint16_t width;
  float cfg_weight;
  float tg_weight;
  int32_t img_width;
  int32_t img_height;
  int32_t img_channels;
  uint64_t img_offset;  // byte offset of raw pixel data in the message
  uint64_t img_bytes;   // expected pixel byte count
} DtpRequest;

enum {
  DTP_OK = 0,
  DTP_ERR_TRUNCATED = 1,
  DTP_ERR_BAD_IMAGE = 2,
};

// Request layout (little-endian), byte-compatible with the reference
// protocol: [u8 type][u8 steps][u8 pad][u8 tg_steps][u16 width]
// [f32 cfg][f32 tg][i32 img_w][i32 img_h][i32 img_c][raw u8 HWC].
int dtp_decode_request(const uint8_t* buf, uint64_t len, DtpRequest* out) {
  const uint64_t header = 1 + 3 + 2 + 8;  // type + u8x3 + u16 + f32x2
  const uint64_t img_header = 12;
  if (len < header + img_header) return DTP_ERR_TRUNCATED;
  uint64_t off = 0;
  out->type = buf[off++];
  out->steps = buf[off++];
  out->context_pad = buf[off++];
  out->tg_steps = buf[off++];
  std::memcpy(&out->width, buf + off, 2); off += 2;
  std::memcpy(&out->cfg_weight, buf + off, 4); off += 4;
  std::memcpy(&out->tg_weight, buf + off, 4); off += 4;
  std::memcpy(&out->img_width, buf + off, 4); off += 4;
  std::memcpy(&out->img_height, buf + off, 4); off += 4;
  std::memcpy(&out->img_channels, buf + off, 4); off += 4;
  if (out->img_width <= 0 || out->img_height <= 0 ||
      out->img_channels <= 0 || out->img_channels > 16 ||
      out->img_width > 1 << 15 || out->img_height > 1 << 15)
    return DTP_ERR_BAD_IMAGE;
  out->img_offset = off;
  out->img_bytes = (uint64_t)out->img_width * out->img_height *
                   out->img_channels;
  if (len < off + out->img_bytes) return DTP_ERR_TRUNCATED;
  return DTP_OK;
}

// Response header: [u8 type][i32 w][i32 h][i32 c]; caller appends pixels.
void dtp_encode_response_header(uint8_t type, int32_t w, int32_t h, int32_t c,
                                uint8_t* out13) {
  out13[0] = type;
  std::memcpy(out13 + 1, &w, 4);
  std::memcpy(out13 + 5, &h, 4);
  std::memcpy(out13 + 9, &c, 4);
}

void dtp_u8_to_f32(const uint8_t* in, float* out, uint64_t n) {
  constexpr float k = 1.0f / 255.0f;
  for (uint64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

void dtp_f32_to_u8(const float* in, uint8_t* out, uint64_t n) {
  for (uint64_t i = 0; i < n; ++i) {
    float v = in[i];
    v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
    out[i] = (uint8_t)(v * 255.0f);
  }
}

// out_rgb = canvas_rgb * alpha + result_rgb * (1 - alpha), all float [0,1];
// canvas is HWC RGBA, result/out are HWC RGB.
void dtp_composite(const float* canvas_rgba, const float* result_rgb,
                   float* out_rgb, uint64_t npix) {
  for (uint64_t i = 0; i < npix; ++i) {
    const float a = canvas_rgba[i * 4 + 3];
    const float ia = 1.0f - a;
    out_rgb[i * 3 + 0] = canvas_rgba[i * 4 + 0] * a + result_rgb[i * 3 + 0] * ia;
    out_rgb[i * 3 + 1] = canvas_rgba[i * 4 + 1] * a + result_rgb[i * 3 + 1] * ia;
    out_rgb[i * 3 + 2] = canvas_rgba[i * 4 + 2] * a + result_rgb[i * 3 + 2] * ia;
  }
}

// uint8 fast path of the composite: canvas RGBA u8, result RGB u8.
void dtp_composite_u8(const uint8_t* canvas_rgba, const uint8_t* result_rgb,
                      uint8_t* out_rgb, uint64_t npix) {
  for (uint64_t i = 0; i < npix; ++i) {
    const uint32_t a = canvas_rgba[i * 4 + 3];
    const uint32_t ia = 255 - a;
    for (int ch = 0; ch < 3; ++ch) {
      const uint32_t mixed = canvas_rgba[i * 4 + ch] * a +
                             result_rgb[i * 3 + ch] * ia;
      out_rgb[i * 3 + ch] = (uint8_t)((mixed + 127) / 255);
    }
  }
}

}  // extern "C"
