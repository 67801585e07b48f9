// _voliox — native volume IO fast path for differender_tpu.
//
// The reference's only data loader is `np.fromfile` + /255 in Python
// (`/root/reference/examples/taichi_volume_raycaster.py:548-550`).  For
// production-size volumes (1024^3 = 1 GiB of uint8) the
// read->widen->normalize pipeline is worth doing off the Python heap in
// native code: this extension streams the file in chunks and converts
// uint8 -> float32/255 with a lookup table, returning a writable buffer
// that numpy wraps zero-copy (np.frombuffer).
//
// Built with setuptools (see setup.py); pure CPython C API, no pybind11.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <vector>

namespace {

// load_u8_normalized(path: str, count: int) -> bytearray (count float32)
PyObject* load_u8_normalized(PyObject*, PyObject* args) {
  const char* path = nullptr;
  Py_ssize_t count = 0;
  if (!PyArg_ParseTuple(args, "sn", &path, &count)) return nullptr;
  if (count < 0) {
    PyErr_SetString(PyExc_ValueError, "count must be non-negative");
    return nullptr;
  }

  FILE* f = std::fopen(path, "rb");
  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }

  PyObject* out = PyByteArray_FromStringAndSize(nullptr, count * 4);
  if (!out) {
    std::fclose(f);
    return nullptr;
  }
  float* dst = reinterpret_cast<float*>(PyByteArray_AsString(out));

  static float lut[256];
  static bool lut_init = false;
  if (!lut_init) {
    for (int i = 0; i < 256; ++i) lut[i] = static_cast<float>(i) / 255.0f;
    lut_init = true;
  }

  constexpr size_t kChunk = 1 << 20;  // 1 MiB of uint8 per read
  std::vector<uint8_t> buf(kChunk);
  Py_ssize_t done = 0;
  Py_BEGIN_ALLOW_THREADS
  while (done < count) {
    size_t want = static_cast<size_t>(count - done);
    if (want > kChunk) want = kChunk;
    size_t got = std::fread(buf.data(), 1, want, f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i) dst[done + i] = lut[buf[i]];
    done += static_cast<Py_ssize_t>(got);
  }
  Py_END_ALLOW_THREADS
  std::fclose(f);

  if (done != count) {
    Py_DECREF(out);
    PyErr_Format(PyExc_ValueError,
                 "%s: expected %zd uint8 voxels, file held %zd", path, count,
                 done);
    return nullptr;
  }
  return out;
}

PyMethodDef kMethods[] = {
    {"load_u8_normalized", load_u8_normalized, METH_VARARGS,
     "Read `count` uint8 values from `path`, return float32 bytearray "
     "normalized to [0, 1]."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_voliox",
    "Native volume IO fast path for differender_tpu.", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__voliox() { return PyModule_Create(&kModule); }
