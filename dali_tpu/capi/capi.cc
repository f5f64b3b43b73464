// dali_tpu C API implementation (reference: dali/c_api_2/pipeline.cc).
//
// Embeds CPython: each pipeline handle owns a Python Pipeline object built via
// Pipeline.deserialize; outputs are materialized to host numpy for copy-out.
// Thread-safety: every entry point takes the GIL.

#include "dali_tpu.h"

#include <Python.h>

#include <cstring>
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

bool g_initialized = false;

}  // namespace

extern "C" {

daliTpuResult daliTpuInit(void) {
  if (g_initialized) return DALI_TPU_OK;
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
  g_initialized = true;
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
  PyObject* main_mod = PyImport_AddModule("__main__");
  PyObject* globals = PyModule_GetDict(main_mod);
  PyObject* code = PyRun_String(
      "import numpy as _np\n"
      "def _dali_tpu_capi_collect(pipe):\n"
      "    outs = pipe.run()\n"
      "    res = []\n"
      "    for tl in outs:\n"
      "        tl = tl.as_cpu() if hasattr(tl, 'as_cpu') else tl\n"
      "        res.append([_np.ascontiguousarray(tl.at(i)) for i in range(len(tl))])\n"
      "    return res\n",
      Py_file_input, globals, globals);
  if (!code) {
    set_error_from_python();
    return DALI_TPU_ERROR;
  }
  Py_DECREF(code);
  PyObject* fn = PyDict_GetItemString(globals, "_dali_tpu_capi_collect");
  PyObject* result = fn ? PyObject_CallFunctionObjArgs(fn, h->pipeline, nullptr) : nullptr;
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
  for (Py_ssize_t i = 0; i < info->ndim && i < 16; i++) {
    info->shape[i] = PyLong_AsLongLong(PyTuple_GetItem(shape, i));
  }
  info->nbytes = PyLong_AsLongLong(nbytes);
  info->dtype = -1;  // numpy dtype mapping left to the caller via nbytes/shape
  Py_DECREF(shape);
  Py_DECREF(nbytes);
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
