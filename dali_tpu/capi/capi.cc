// dali_tpu C API implementation (reference: dali/c_api_2/pipeline.cc).
//
// Embeds CPython: each pipeline handle owns a Python Pipeline object built via
// Pipeline.deserialize; outputs are materialized to host numpy for copy-out.
// Thread-safety: every entry point takes the GIL.

#include "dali_tpu.h"

#include <Python.h>

#include <atomic>
#include <cstring>
#include <mutex>
#include <string>

namespace {

thread_local std::string g_last_error;

struct PipelineHandle {
  PyObject* pipeline = nullptr;     // dali_tpu Pipeline
  PyObject* last_outputs = nullptr; // list of numpy arrays per output: list[list[np.ndarray]]
};

void set_error_from_python() {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  if (value) {
    PyObject* s = PyObject_Str(value);
    if (s) {
      g_last_error = PyUnicode_AsUTF8(s);
      Py_DECREF(s);
    }
  } else {
    g_last_error = "unknown python error";
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

class Gil {
 public:
  Gil() : state_(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

std::atomic<bool> g_initialized{false};
std::mutex g_init_mutex;  // serializes first-time interpreter bring-up

// max dims a daliTpuTensorInfo can carry (dali_tpu.h shape[16])
constexpr int kMaxDims = 16;

// Compile a Python helper ONCE into a PRIVATE globals dict (not the
// embedder's __main__ — injecting _np/_dt there clobbered user globals, and
// re-running PyRun_String per call paid a parse+compile on the hot path).
// The returned function keeps its globals alive via __globals__; the cached
// reference is process-lifetime.
PyObject* cached_helper(const char* src, const char* fname, PyObject** cache) {
  if (*cache) return *cache;
  PyObject* g = PyDict_New();
  if (!g) return nullptr;
  PyDict_SetItemString(g, "__builtins__", PyEval_GetBuiltins());
  PyObject* code = PyRun_String(src, Py_file_input, g, g);
  if (!code) {
    Py_DECREF(g);
    return nullptr;
  }
  Py_DECREF(code);
  PyObject* fn = PyDict_GetItemString(g, fname);  // borrowed
  Py_XINCREF(fn);
  Py_DECREF(g);
  *cache = fn;
  return fn;
}

}  // namespace

extern "C" {

daliTpuResult daliTpuInit(void) {
  if (g_initialized.load(std::memory_order_acquire)) return DALI_TPU_OK;
  // serialize first-time bring-up: unsynchronized check-then-act raced two
  // threads into concurrent Py_InitializeEx (UB) and a PyEval_SaveThread
  // from the thread that did NOT initialize (fatal) — the header promises
  // thread safety. Contenders block here while the winner initializes.
  std::lock_guard<std::mutex> lock(g_init_mutex);
  if (g_initialized.load(std::memory_order_acquire)) return DALI_TPU_OK;
  bool we_initialized = false;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    we_initialized = true;
  }
  {
    Gil gil;
    PyObject* mod = PyImport_ImportModule("dali_tpu");
    if (!mod) {
      set_error_from_python();
      return DALI_TPU_ERROR;
    }
    Py_DECREF(mod);
  }
  if (we_initialized) {
    // Py_InitializeEx leaves the GIL held by this thread; release it so other
    // threads' PyGILState_Ensure calls don't deadlock.
    PyEval_SaveThread();
  }
  g_initialized.store(true, std::memory_order_release);
  return DALI_TPU_OK;
}

const char* daliTpuGetLastError(void) { return g_last_error.c_str(); }

daliTpuResult daliTpuCreatePipeline(daliTpuPipeline* handle,
                                    const char* serialized_json, size_t len) {
  if (daliTpuInit() != DALI_TPU_OK) return DALI_TPU_ERROR;
  Gil gil;
  PyObject* mod = PyImport_ImportModule("dali_tpu");
  PyObject* cls = mod ? PyObject_GetAttrString(mod, "Pipeline") : nullptr;
  PyObject* payload = PyUnicode_FromStringAndSize(serialized_json, len);
  PyObject* pipe =
      cls && payload ? PyObject_CallMethod(cls, "deserialize", "O", payload) : nullptr;
  Py_XDECREF(payload);
  Py_XDECREF(cls);
  Py_XDECREF(mod);
  if (!pipe) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  PyObject* built = PyObject_CallMethod(pipe, "build", nullptr);
  if (!built) {
    set_error_from_python();
    Py_DECREF(pipe);
    return DALI_TPU_ERROR;
  }
  Py_DECREF(built);
  auto* h = new PipelineHandle();
  h->pipeline = pipe;
  *handle = h;
  return DALI_TPU_OK;
}

daliTpuResult daliTpuRun(daliTpuPipeline handle) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h || !h->pipeline) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  // run + convert each output's samples to host numpy arrays
  static PyObject* collect_fn = nullptr;
  PyObject* fn = cached_helper(
      "import numpy as _np\n"
      "def _dali_tpu_capi_collect(pipe):\n"
      "    outs = pipe.run()\n"
      "    res = []\n"
      "    for tl in outs:\n"
      "        tl = tl.as_cpu() if hasattr(tl, 'as_cpu') else tl\n"
      "        res.append([_np.ascontiguousarray(tl.at(i)) for i in range(len(tl))])\n"
      "    return res\n",
      "_dali_tpu_capi_collect", &collect_fn);
  if (!fn) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  PyObject* result = PyObject_CallFunctionObjArgs(fn, h->pipeline, nullptr);
  if (!result) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  Py_XDECREF(h->last_outputs);
  h->last_outputs = result;
  return DALI_TPU_OK;
}

static PyObject* get_sample(PipelineHandle* h, int output, int sample) {
  if (!h->last_outputs) return nullptr;
  PyObject* out = PyList_GetItem(h->last_outputs, output);  // borrowed
  if (!out) return nullptr;
  return PyList_GetItem(out, sample);  // borrowed
}

daliTpuResult daliTpuOutputCount(daliTpuPipeline handle, int* count) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  if (!h->last_outputs) {
    g_last_error = "no outputs: call daliTpuRun first";
    return DALI_TPU_ERROR;
  }
  *count = (int)PyList_Size(h->last_outputs);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuBatchSize(daliTpuPipeline handle, int* batch_size) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h || !h->pipeline) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  PyObject* bs = PyObject_GetAttrString(h->pipeline, "max_batch_size");
  if (!bs) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  *batch_size = (int)PyLong_AsLong(bs);
  Py_DECREF(bs);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuOutputInfo(daliTpuPipeline handle, int output, int sample,
                                daliTpuTensorInfo* info) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  PyObject* arr = get_sample(h, output, sample);
  if (!arr) {
    set_error_from_python();
    g_last_error = "invalid output/sample index (or run not called)";
    PyErr_Clear();
    return DALI_TPU_ERROR;
  }
  PyObject* shape = PyObject_GetAttrString(arr, "shape");
  PyObject* nbytes = PyObject_GetAttrString(arr, "nbytes");
  if (!shape || !nbytes) {
    set_error_from_python();
    Py_XDECREF(shape);
    Py_XDECREF(nbytes);
    return DALI_TPU_ERROR;
  }
  info->ndim = PyTuple_Size(shape);
  if (info->ndim > kMaxDims) {
    // never report a rank the 16-slot shape array can't carry: the
    // documented caller pattern iterates shape[0..ndim) and would read past
    // the array into dtype/nbytes
    Py_DECREF(shape);
    Py_DECREF(nbytes);
    g_last_error = "sample rank exceeds daliTpuTensorInfo's 16 dims";
    return DALI_TPU_ERROR;
  }
  for (Py_ssize_t i = 0; i < info->ndim; i++) {
    info->shape[i] = PyLong_AsLongLong(PyTuple_GetItem(shape, i));
  }
  info->nbytes = PyLong_AsLongLong(nbytes);
  Py_DECREF(shape);
  Py_DECREF(nbytes);
  // DALIDataType of the sample (types.from_numpy_type); best-effort — on any
  // failure leave dtype=-1 and CLEAR the error indicator (a dangling pending
  // exception would corrupt the next C-API call into Python)
  info->dtype = -1;
  PyObject* types_mod = PyImport_ImportModule("dali_tpu.types");
  PyObject* dt = PyObject_GetAttrString(arr, "dtype");
  if (types_mod && dt) {
    PyObject* v = PyObject_CallMethod(types_mod, "from_numpy_type", "O", dt);
    if (v) {
      PyObject* iv = PyObject_GetAttrString(v, "value");
      info->dtype = (int32_t)PyLong_AsLong(iv ? iv : v);
      Py_XDECREF(iv);
      Py_DECREF(v);
    }
  }
  PyErr_Clear();
  Py_XDECREF(dt);
  Py_XDECREF(types_mod);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuCopyOutputSample(daliTpuPipeline handle, int output,
                                      int sample, void* dst, size_t dst_bytes) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  PyObject* arr = get_sample(h, output, sample);
  if (!arr) {
    g_last_error = "invalid output/sample index (or run not called)";
    PyErr_Clear();
    return DALI_TPU_ERROR;
  }
  PyObject* tobytes = PyObject_CallMethod(arr, "tobytes", nullptr);
  if (!tobytes) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  char* buf;
  Py_ssize_t n;
  PyBytes_AsStringAndSize(tobytes, &buf, &n);
  if ((size_t)n > dst_bytes) {
    Py_DECREF(tobytes);
    g_last_error = "destination buffer too small";
    return DALI_TPU_BUFFER_TOO_SMALL;
  }
  std::memcpy(dst, buf, n);
  Py_DECREF(tobytes);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuOutputSampleData(daliTpuPipeline handle, int output,
                                      int sample, const void** data,
                                      daliTpuTensorInfo* info) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  PyObject* arr = get_sample(h, output, sample);
  if (!arr) {
    g_last_error = "invalid output/sample index (or run not called)";
    PyErr_Clear();
    return DALI_TPU_ERROR;
  }
  // borrow: pointer into the numpy array backing the last outputs; valid
  // until the next daliTpuRun / daliTpuDestroyPipeline (reference c_api_2
  // zero-copy output access contract)
  PyObject* iface = PyObject_GetAttrString(arr, "__array_interface__");
  if (!iface) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  PyObject* dataf = PyDict_GetItemString(iface, "data");  // borrowed
  PyObject* ptr = dataf ? PyTuple_GetItem(dataf, 0) : nullptr;
  if (!ptr) {
    Py_DECREF(iface);
    g_last_error = "array interface missing data pointer";
    return DALI_TPU_ERROR;
  }
  *data = (const void*)PyLong_AsUnsignedLongLong(ptr);
  Py_DECREF(iface);
  if (info) return daliTpuOutputInfo(handle, output, sample, info);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuFeedInput(daliTpuPipeline handle, const char* name,
                               const void* data, const daliTpuTensorInfo* infos,
                               int n_samples, const char* layout) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h || !h->pipeline) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  // build list of per-sample numpy arrays copied out of the caller buffer
  static PyObject* feed_fn = nullptr;
  PyObject* fn = cached_helper(
      "import numpy as _np\n"
      "import dali_tpu.types as _dt\n"
      "def _dali_tpu_capi_feed(pipe, name, blob, shapes, dtypes, layout):\n"
      "    pos = 0\n"
      "    samples = []\n"
      "    for shape, dt in zip(shapes, dtypes):\n"
      "        npdt = _np.dtype(_dt.to_numpy_type(_dt.DALIDataType(dt))) \\\n"
      "            if dt >= 0 else _np.dtype(_np.uint8)\n"
      "        n = int(_np.prod(shape)) * npdt.itemsize if shape else npdt.itemsize\n"
      "        a = _np.frombuffer(blob[pos:pos+n], dtype=npdt).reshape(shape).copy()\n"
      "        pos += n\n"
      "        samples.append(a)\n"
      "    pipe.feed_input(name, samples, layout=layout or None)\n",
      "_dali_tpu_capi_feed", &feed_fn);
  if (!fn) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  for (int i = 0; i < n_samples; i++) {
    if (infos[i].ndim < 0 || infos[i].ndim > kMaxDims) {
      g_last_error = "daliTpuFeedInput: sample ndim outside [0, 16]";
      return DALI_TPU_ERROR;
    }
  }
  size_t total = 0;
  PyObject* shapes = PyList_New(n_samples);
  PyObject* dtypes = PyList_New(n_samples);
  for (int i = 0; i < n_samples; i++) {
    const daliTpuTensorInfo& ti = infos[i];
    PyObject* shp = PyTuple_New(ti.ndim);
    for (int d = 0; d < ti.ndim; d++)
      PyTuple_SetItem(shp, d, PyLong_FromLongLong(ti.shape[d]));
    PyList_SetItem(shapes, i, shp);
    PyList_SetItem(dtypes, i, PyLong_FromLong(ti.dtype));
    total += (size_t)ti.nbytes;
  }
  PyObject* blob = PyBytes_FromStringAndSize((const char*)data, total);
  PyObject* pyname = PyUnicode_FromString(name);
  PyObject* pylayout = PyUnicode_FromString(layout ? layout : "");
  PyObject* result =
      fn ? PyObject_CallFunctionObjArgs(fn, h->pipeline, pyname, blob, shapes,
                                        dtypes, pylayout, nullptr)
         : nullptr;
  Py_XDECREF(pyname);
  Py_XDECREF(pylayout);
  Py_XDECREF(blob);
  Py_XDECREF(shapes);
  Py_XDECREF(dtypes);
  if (!result) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  Py_DECREF(result);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuCheckpoint(daliTpuPipeline handle, char* dst,
                                size_t dst_bytes, size_t* required) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h || !h->pipeline) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  PyObject* payload = PyObject_CallMethod(h->pipeline, "checkpoint", nullptr);
  if (!payload) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  Py_ssize_t n;
  const char* s = PyUnicode_AsUTF8AndSize(payload, &n);
  if (required) *required = (size_t)n + 1;
  if (!dst || dst_bytes < (size_t)n + 1) {
    Py_DECREF(payload);
    return dst ? DALI_TPU_BUFFER_TOO_SMALL : DALI_TPU_OK;
  }
  std::memcpy(dst, s, n + 1);
  Py_DECREF(payload);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuRestoreCheckpoint(daliTpuPipeline handle,
                                       const char* payload, size_t len) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h || !h->pipeline) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  PyObject* py = PyUnicode_FromStringAndSize(payload, len);
  PyObject* r =
      py ? PyObject_CallMethod(h->pipeline, "restore_checkpoint", "O", py)
         : nullptr;
  Py_XDECREF(py);
  if (!r) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  Py_DECREF(r);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuReaderSize(daliTpuPipeline handle, const char* reader_name,
                                int64_t* size) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h || !h->pipeline) return DALI_TPU_INVALID_HANDLE;
  Gil gil;
  PyObject* meta =
      PyObject_CallMethod(h->pipeline, "reader_meta", "s", reader_name);
  if (!meta) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  PyObject* sz = PyDict_GetItemString(meta, "epoch_size");  // borrowed
  *size = sz ? PyLong_AsLongLong(sz) : -1;
  Py_DECREF(meta);
  return DALI_TPU_OK;
}

daliTpuResult daliTpuDestroyPipeline(daliTpuPipeline handle) {
  auto* h = static_cast<PipelineHandle*>(handle);
  if (!h) return DALI_TPU_INVALID_HANDLE;
  {
    Gil gil;
    Py_XDECREF(h->last_outputs);
    Py_XDECREF(h->pipeline);
  }
  delete h;
  return DALI_TPU_OK;
}

}  // extern "C"
