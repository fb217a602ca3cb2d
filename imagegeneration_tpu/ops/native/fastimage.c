/* fastimage — native JPEG decode + center-crop + bilinear resize.
 *
 * The TPU-native counterpart of the reference's tf.data decode path
 * (image_dataset_from_directory -> decode_jpeg -> crop_to_aspect_ratio ->
 * bilinear resize; sndcgan/SNDCGAN.py:131-145). Three things the Python
 * stack doesn't give us:
 *
 *  1. DCT-domain prescaling: libjpeg can decode directly at 1/2, 1/4, 1/8
 *     scale (scale_num/scale_denom), so a 4000x3000 source headed for
 *     256x144 is decoded at 1/8 cost instead of full size;
 *  2. single-pass crop+resize into a caller-provided buffer (no temporary
 *     full-size RGB array per image);
 *  3. GIL released around the whole decode, so a host pipeline thread
 *     overlaps decode with TPU compute.
 *
 * Exposed functions (CPython C API; no pybind11 in this image):
 *   decode_resize_jpeg(data: bytes, th: int, tw: int, crop: bool) -> bytes
 *     RGB uint8 of length th*tw*3 (raises ValueError on corrupt input).
 *   jpeg_dims(data: bytes) -> (h, w)
 *
 * Bilinear resize uses half-pixel centers (matching cv2.INTER_LINEAR /
 * TF2 resize); the center-crop integer math matches core/data.load_image.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <jpeglib.h>
#include <setjmp.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

struct fi_error_mgr {
  struct jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
  char msg[JMSG_LENGTH_MAX];
};

static void fi_error_exit(j_common_ptr cinfo) {
  struct fi_error_mgr *err = (struct fi_error_mgr *)cinfo->err;
  (*cinfo->err->format_message)(cinfo, err->msg);
  longjmp(err->setjmp_buffer, 1);
}

/* Bilinear resize (half-pixel centers) from src (sh x sw x 3, row stride
 * sw*3, starting at offset) into dst (th x tw x 3). */
static void bilinear_resize(const uint8_t *src, int sh, int sw, uint8_t *dst,
                            int th, int tw) {
  const double scale_y = (double)sh / th;
  const double scale_x = (double)sw / tw;
  for (int y = 0; y < th; y++) {
    double fy = (y + 0.5) * scale_y - 0.5;
    if (fy < 0) fy = 0;
    int y0 = (int)fy;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    double wy = fy - y0;
    for (int x = 0; x < tw; x++) {
      double fx = (x + 0.5) * scale_x - 0.5;
      if (fx < 0) fx = 0;
      int x0 = (int)fx;
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      double wx = fx - x0;
      const uint8_t *p00 = src + (y0 * sw + x0) * 3;
      const uint8_t *p01 = src + (y0 * sw + x1) * 3;
      const uint8_t *p10 = src + (y1 * sw + x0) * 3;
      const uint8_t *p11 = src + (y1 * sw + x1) * 3;
      uint8_t *out = dst + (y * tw + x) * 3;
      for (int c = 0; c < 3; c++) {
        double top = p00[c] + (p01[c] - p00[c]) * wx;
        double bot = p10[c] + (p11[c] - p10[c]) * wx;
        double v = top + (bot - top) * wy;
        int iv = (int)(v + 0.5);
        out[c] = (uint8_t)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
      }
    }
  }
}

/* Decode JPEG bytes to RGB with optional center-crop-to-aspect + resize.
 * Returns 0 on success, fills err_msg on failure. */
static int decode_core(const uint8_t *data, size_t len, int th, int tw,
                       int crop, uint8_t *out, char *err_msg) {
  struct jpeg_decompress_struct cinfo;
  struct fi_error_mgr jerr;
  uint8_t *full = NULL;

  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = fi_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    strncpy(err_msg, jerr.msg, JMSG_LENGTH_MAX - 1);
    jpeg_destroy_decompress(&cinfo);
    free(full);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  /* DCT-domain prescale: decode at 1/2^k while both dims stay >= 2x the
   * target (keeps bilinear quality). */
  int denom = 1;
  while (denom < 8 && (int)cinfo.image_width / (denom * 2) >= 2 * tw &&
         (int)cinfo.image_height / (denom * 2) >= 2 * th) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  int sw = cinfo.output_width;
  int sh = cinfo.output_height;
  int comps = cinfo.output_components;
  if (comps != 3) {
    /* grayscale etc.: bail to the Python fallback */
    strncpy(err_msg, "non-RGB jpeg", JMSG_LENGTH_MAX - 1);
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  full = (uint8_t *)malloc((size_t)sh * sw * 3);
  if (!full) {
    strncpy(err_msg, "oom", JMSG_LENGTH_MAX - 1);
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = full + (size_t)cinfo.output_scanline * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  /* center crop to target aspect (matches core/data.load_image). */
  int cx = 0, cy = 0, cw = sw, ch = sh;
  if (crop && (long)sh * tw != (long)sw * th) {
    if ((long)sh * tw > (long)sw * th) { /* too tall */
      ch = (int)(((long)sw * th) / tw);
      cy = (sh - ch) / 2;
    } else { /* too wide */
      cw = (int)(((long)sh * tw) / th);
      cx = (sw - cw) / 2;
    }
  }
  /* pack the crop contiguously if needed, then resize. */
  if (cx == 0 && cy == 0 && cw == sw && ch == sh) {
    if (sh == th && sw == tw) {
      memcpy(out, full, (size_t)th * tw * 3);
    } else {
      bilinear_resize(full, sh, sw, out, th, tw);
    }
  } else {
    uint8_t *cropped = (uint8_t *)malloc((size_t)ch * cw * 3);
    if (!cropped) {
      strncpy(err_msg, "oom", JMSG_LENGTH_MAX - 1);
      free(full);
      return -1;
    }
    for (int y = 0; y < ch; y++) {
      memcpy(cropped + (size_t)y * cw * 3,
             full + ((size_t)(y + cy) * sw + cx) * 3, (size_t)cw * 3);
    }
    if (ch == th && cw == tw) {
      memcpy(out, cropped, (size_t)th * tw * 3);
    } else {
      bilinear_resize(cropped, ch, cw, out, th, tw);
    }
    free(cropped);
  }
  free(full);
  return 0;
}

static PyObject *py_decode_resize_jpeg(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int th, tw, crop = 1;
  if (!PyArg_ParseTuple(args, "y*ii|p", &buf, &th, &tw, &crop)) return NULL;
  if (th <= 0 || tw <= 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "target dims must be positive");
    return NULL;
  }
  PyObject *out_bytes = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)th * tw * 3);
  if (!out_bytes) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *out = (uint8_t *)PyBytes_AS_STRING(out_bytes);
  char err_msg[JMSG_LENGTH_MAX] = {0};
  int rc;
  Py_BEGIN_ALLOW_THREADS
  rc = decode_core((const uint8_t *)buf.buf, (size_t)buf.len, th, tw, crop,
                   out, err_msg);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (rc != 0) {
    Py_DECREF(out_bytes);
    PyErr_SetString(PyExc_ValueError, err_msg);
    return NULL;
  }
  return out_bytes;
}

static PyObject *py_jpeg_dims(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  struct jpeg_decompress_struct cinfo;
  struct fi_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = fi_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, jerr.msg);
    return NULL;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, (const uint8_t *)buf.buf, (size_t)buf.len);
  jpeg_read_header(&cinfo, TRUE);
  int h = cinfo.image_height, w = cinfo.image_width;
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  PyBuffer_Release(&buf);
  return Py_BuildValue("(ii)", h, w);
}

static PyMethodDef Methods[] = {
    {"decode_resize_jpeg", py_decode_resize_jpeg, METH_VARARGS,
     "decode_resize_jpeg(data, th, tw, crop=True) -> RGB bytes (th*tw*3)"},
    {"jpeg_dims", py_jpeg_dims, METH_VARARGS, "jpeg_dims(data) -> (h, w)"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastimage",
    "native JPEG decode + crop + resize (libjpeg)", -1, Methods};

PyMODINIT_FUNC PyInit__fastimage(void) { return PyModule_Create(&moduledef); }
