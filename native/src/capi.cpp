/*
 * C ABI shim for obj2voxel-tpu.
 *
 * Implements the reference-compatible C API (../include/obj2voxel.h) by
 * embedding CPython and delegating to the obj2voxel_tpu.api module -- the
 * same pattern as the reference's C API layer over its C++ engine
 * (reference: src/obj2voxel.cpp:645-1003), with the engine swapped for the
 * TPU pipeline.  All entry points are GIL-safe and callable from any thread,
 * preserving the reference's worker-ownership contract.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <mutex>

#include "../include/obj2voxel.h"

// ---------------------------------------------------------------------------
// interpreter bootstrap
// ---------------------------------------------------------------------------

static std::once_flag g_init_once;
static PyThreadState *g_main_tstate = nullptr;

static void ensure_interpreter() {
    std::call_once(g_init_once, [] {
        if (!Py_IsInitialized()) {
            Py_InitializeEx(0);
            // Allow `import obj2voxel_tpu` from an uninstalled checkout when
            // OBJ2VOXEL_TPU_PATH is set.
            const char *extra = std::getenv("OBJ2VOXEL_TPU_PATH");
            if (extra != nullptr) {
                PyObject *sys_path = PySys_GetObject("path");  // borrowed
                PyObject *p = PyUnicode_FromString(extra);
                if (sys_path && p) PyList_Insert(sys_path, 0, p);
                Py_XDECREF(p);
            }
            g_main_tstate = PyEval_SaveThread();  // release GIL for embedders
        }
    });
}

struct GilGuard {
    PyGILState_STATE state;
    GilGuard() {
        ensure_interpreter();
        state = PyGILState_Ensure();
    }
    ~GilGuard() { PyGILState_Release(state); }
};

static void print_py_error(const char *where) {
    if (PyErr_Occurred()) {
        std::fprintf(stderr, "[obj2voxel-capi] Python error in %s:\n", where);
        PyErr_Print();
    }
}

static PyObject *api_module() {
    PyObject *mod = PyImport_ImportModule("obj2voxel_tpu.api");
    if (!mod) print_py_error("import obj2voxel_tpu.api");
    return mod;
}

// ---------------------------------------------------------------------------
// opaque structs
// ---------------------------------------------------------------------------

struct obj2voxel_texture {
    PyObject *py = nullptr;  // obj2voxel_tpu.api.Texture
};

// Triangle data filled by user input callbacks (reference semantics:
// src/obj2voxel.cpp:818-854).
struct obj2voxel_triangle {
    int type = 0;  // 0 none, 1 materialless, 2 colored, 3 textured
    float vertices[9] = {};
    float uvs[6] = {};
    float color[3] = {1.f, 1.f, 1.f};
    obj2voxel_texture *texture = nullptr;
};

struct obj2voxel_instance {
    PyObject *py = nullptr;  // obj2voxel_tpu.api.Instance

    obj2voxel_triangle_callback *in_cb = nullptr;
    void *in_cb_data = nullptr;
    obj2voxel_voxel_callback *out_cb = nullptr;
    void *out_cb_data = nullptr;

    PyObject *memory = nullptr;  // bytes kept alive for get_output_memory

    // worker-contract bookkeeping (reference obj2voxel.cpp:957-1003)
    std::mutex worker_mutex;
    std::condition_variable worker_cv;
    uint32_t worker_count = 0;
    bool workers_stopped = false;
};

// ---------------------------------------------------------------------------
// callback trampolines (C function pointers -> Python callables)
// ---------------------------------------------------------------------------

// input: Python calls trampoline(py_triangle) -> bool; we forward to the C
// callback and copy the filled C triangle into the Python Triangle object.
static PyObject *input_trampoline(PyObject *self, PyObject *args) {
    auto *inst = static_cast<obj2voxel_instance *>(PyCapsule_GetPointer(self, nullptr));
    PyObject *py_tri;
    if (!PyArg_ParseTuple(args, "O", &py_tri)) return nullptr;

    obj2voxel_triangle ctri;
    bool more;
    Py_BEGIN_ALLOW_THREADS
    more = inst->in_cb(inst->in_cb_data, &ctri);
    Py_END_ALLOW_THREADS
    if (!more) Py_RETURN_FALSE;

    PyObject *verts = PyTuple_New(9);
    for (int i = 0; i < 9; ++i)
        PyTuple_SET_ITEM(verts, i, PyFloat_FromDouble(ctri.vertices[i]));

    PyObject *r = nullptr;
    if (ctri.type == 3 && ctri.texture != nullptr && ctri.texture->py != nullptr) {
        PyObject *uvs = PyTuple_New(6);
        for (int i = 0; i < 6; ++i)
            PyTuple_SET_ITEM(uvs, i, PyFloat_FromDouble(ctri.uvs[i]));
        r = PyObject_CallMethod(py_tri, "set_textured", "OOO", verts, uvs,
                                ctri.texture->py);
        Py_DECREF(uvs);
    } else if (ctri.type == 2) {
        PyObject *col = Py_BuildValue("(fff)", ctri.color[0], ctri.color[1],
                                      ctri.color[2]);
        r = PyObject_CallMethod(py_tri, "set_colored", "OO", verts, col);
        Py_DECREF(col);
    } else {
        r = PyObject_CallMethod(py_tri, "set_basic", "(O)", verts);
    }
    Py_DECREF(verts);
    if (!r) {
        print_py_error("input trampoline");
        Py_RETURN_FALSE;
    }
    Py_DECREF(r);
    Py_RETURN_TRUE;
}

// output: Python calls trampoline(u32_array, count) -> bool; the array
// supports the buffer protocol with VL32 layout (x, y, z, argb) per row.
static PyObject *output_trampoline(PyObject *self, PyObject *args) {
    auto *inst = static_cast<obj2voxel_instance *>(PyCapsule_GetPointer(self, nullptr));
    PyObject *arr;
    Py_ssize_t count;
    if (!PyArg_ParseTuple(args, "On", &arr, &count)) return nullptr;

    Py_buffer view;
    if (PyObject_GetBuffer(arr, &view, PyBUF_C_CONTIGUOUS) != 0) return nullptr;
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    ok = inst->out_cb(inst->out_cb_data, static_cast<uint32_t *>(view.buf),
                      static_cast<size_t>(count));
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&view);
    return PyBool_FromLong(ok ? 1 : 0);
}

// log: Python calls trampoline(msg, level) -> handled?
static obj2voxel_log_callback *g_log_cb = nullptr;
static void *g_log_cb_data = nullptr;

static PyObject *log_trampoline(PyObject *, PyObject *args) {
    const char *msg;
    int level;
    if (!PyArg_ParseTuple(args, "si", &msg, &level)) return nullptr;
    if (g_log_cb == nullptr) Py_RETURN_FALSE;
    bool handled = g_log_cb(g_log_cb_data, msg, static_cast<obj2voxel_enum_t>(level));
    return PyBool_FromLong(handled ? 1 : 0);
}

static PyMethodDef g_input_def = {"_o2v_input", input_trampoline, METH_VARARGS, nullptr};
static PyMethodDef g_output_def = {"_o2v_output", output_trampoline, METH_VARARGS, nullptr};
static PyMethodDef g_log_def = {"_o2v_log", log_trampoline, METH_VARARGS, nullptr};

// ---------------------------------------------------------------------------
// helpers
// ---------------------------------------------------------------------------

static void call_void(PyObject *obj, const char *method, const char *fmt, ...) {
    // fmt must build a TUPLE, e.g. "(I)" or "(O)"
    if (!obj) return;
    va_list va;
    va_start(va, fmt);
    PyObject *args = Py_VaBuildValue(fmt, va);
    va_end(va);
    PyObject *m = PyObject_GetAttrString(obj, method);
    PyObject *r = (m && args) ? PyObject_Call(m, args, nullptr) : nullptr;
    if (!r) print_py_error(method);
    Py_XDECREF(r);
    Py_XDECREF(m);
    Py_XDECREF(args);
}

// ---------------------------------------------------------------------------
// instance lifecycle
// ---------------------------------------------------------------------------

extern "C" obj2voxel_instance *obj2voxel_alloc(void) {
    GilGuard gil;
    PyObject *mod = api_module();
    if (!mod) return nullptr;
    PyObject *inst_py = PyObject_CallMethod(mod, "Instance", nullptr);
    Py_DECREF(mod);
    if (!inst_py) {
        print_py_error("Instance()");
        return nullptr;
    }
    auto *inst = new obj2voxel_instance;
    inst->py = inst_py;
    return inst;
}

extern "C" void obj2voxel_free(obj2voxel_instance *instance) {
    if (!instance) return;
    {
        GilGuard gil;
        Py_XDECREF(instance->py);
        Py_XDECREF(instance->memory);
    }
    delete instance;
}

// ---------------------------------------------------------------------------
// logging
// ---------------------------------------------------------------------------

extern "C" void obj2voxel_set_log_level(obj2voxel_enum_t level) {
    GilGuard gil;
    PyObject *mod = api_module();
    if (!mod) return;
    PyObject *r = PyObject_CallMethod(mod, "set_log_level", "i", (int)level);
    Py_XDECREF(r);
    Py_DECREF(mod);
}

extern "C" obj2voxel_enum_t obj2voxel_get_log_level(void) {
    GilGuard gil;
    PyObject *mod = api_module();
    if (!mod) return OBJ2VOXEL_LOG_LEVEL_INFO;
    PyObject *r = PyObject_CallMethod(mod, "get_log_level", nullptr);
    Py_DECREF(mod);
    if (!r) return OBJ2VOXEL_LOG_LEVEL_INFO;
    long level = PyLong_AsLong(r);
    Py_DECREF(r);
    return static_cast<obj2voxel_enum_t>(level);
}

extern "C" void obj2voxel_set_log_callback(obj2voxel_log_callback *callback,
                                           void *callback_data) {
    GilGuard gil;
    g_log_cb = callback;
    g_log_cb_data = callback_data;
    PyObject *mod = api_module();
    if (!mod) return;
    if (callback == nullptr) {
        PyObject *r = PyObject_CallMethod(mod, "set_log_callback", "(O)", Py_None);
        Py_XDECREF(r);
    } else {
        PyObject *fn = PyCFunction_New(&g_log_def, nullptr);
        PyObject *r = PyObject_CallMethod(mod, "set_log_callback", "(O)", fn);
        Py_XDECREF(r);
        Py_XDECREF(fn);
    }
    Py_DECREF(mod);
}

// ---------------------------------------------------------------------------
// settings
// ---------------------------------------------------------------------------

extern "C" void obj2voxel_set_resolution(obj2voxel_instance *inst, uint32_t res) {
    GilGuard gil;
    call_void(inst->py, "set_resolution", "(I)", res);
}

extern "C" void obj2voxel_set_supersampling(obj2voxel_instance *inst, uint32_t level) {
    GilGuard gil;
    call_void(inst->py, "set_supersampling", "(I)", level);
}

extern "C" void obj2voxel_set_color_strategy(obj2voxel_instance *inst,
                                             obj2voxel_enum_t strategy) {
    GilGuard gil;
    call_void(inst->py, "set_color_strategy", "(i)", (int)strategy);
}

extern "C" void obj2voxel_set_texture(obj2voxel_instance *inst,
                                      obj2voxel_texture *texture) {
    GilGuard gil;
    if (texture && texture->py) call_void(inst->py, "set_texture", "(O)", texture->py);
}

extern "C" void obj2voxel_set_input_file(obj2voxel_instance *inst, const char *file,
                                         const char *type) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(inst->py, "set_input_file", "sz", file, type);
    if (!r) print_py_error("set_input_file");
    Py_XDECREF(r);
}

extern "C" void obj2voxel_set_input_callback(obj2voxel_instance *inst,
                                             obj2voxel_triangle_callback *callback,
                                             void *callback_data) {
    GilGuard gil;
    inst->in_cb = callback;
    inst->in_cb_data = callback_data;
    PyObject *capsule = PyCapsule_New(inst, nullptr, nullptr);
    PyObject *fn = PyCFunction_New(&g_input_def, capsule);
    Py_DECREF(capsule);
    call_void(inst->py, "set_input_callback", "(O)", fn);
    Py_XDECREF(fn);
}

extern "C" void obj2voxel_set_output_file(obj2voxel_instance *inst, const char *file,
                                          const char *type) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(inst->py, "set_output_file", "sz", file, type);
    if (!r) print_py_error("set_output_file");
    Py_XDECREF(r);
}

extern "C" void obj2voxel_set_output_memory(obj2voxel_instance *inst, const char *type) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(inst->py, "set_output_memory", "s", type);
    if (!r) print_py_error("set_output_memory");
    Py_XDECREF(r);
}

extern "C" void obj2voxel_set_output_callback(obj2voxel_instance *inst,
                                              obj2voxel_voxel_callback *callback,
                                              void *callback_data) {
    GilGuard gil;
    inst->out_cb = callback;
    inst->out_cb_data = callback_data;
    PyObject *capsule = PyCapsule_New(inst, nullptr, nullptr);
    PyObject *fn = PyCFunction_New(&g_output_def, capsule);
    Py_DECREF(capsule);
    call_void(inst->py, "set_output_callback", "(O)", fn);
    Py_XDECREF(fn);
}

extern "C" void obj2voxel_set_parallel(obj2voxel_instance *inst, bool enabled) {
    GilGuard gil;
    call_void(inst->py, "set_parallel", "(i)", enabled ? 1 : 0);
}

extern "C" void obj2voxel_set_unit_transform(obj2voxel_instance *inst,
                                             const int transform[9]) {
    GilGuard gil;
    PyObject *t = PyTuple_New(9);
    for (int i = 0; i < 9; ++i) PyTuple_SET_ITEM(t, i, PyLong_FromLong(transform[i]));
    call_void(inst->py, "set_unit_transform", "(O)", t);
    Py_DECREF(t);
}

extern "C" void obj2voxel_set_mesh_boundaries(obj2voxel_instance *inst,
                                              const float bounds[6]) {
    GilGuard gil;
    PyObject *t = PyTuple_New(6);
    for (int i = 0; i < 6; ++i)
        PyTuple_SET_ITEM(t, i, PyFloat_FromDouble(bounds[i]));
    call_void(inst->py, "set_mesh_boundaries", "(O)", t);
    Py_DECREF(t);
}

extern "C" uint32_t obj2voxel_get_resolution(obj2voxel_instance *inst) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(inst->py, "get_resolution", nullptr);
    if (!r) return 0;
    long v = PyLong_AsLong(r);
    Py_DECREF(r);
    return static_cast<uint32_t>(v);
}

extern "C" uint32_t obj2voxel_get_chunk_size(obj2voxel_instance *inst) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(inst->py, "get_chunk_size", nullptr);
    if (!r) return 64;
    long v = PyLong_AsLong(r);
    Py_DECREF(r);
    return static_cast<uint32_t>(v);
}

extern "C" const obj2voxel_byte_t *obj2voxel_get_output_memory(
    obj2voxel_instance *inst, size_t *out_size) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(inst->py, "get_output_memory", nullptr);
    if (!r || r == Py_None) {
        Py_XDECREF(r);
        return nullptr;
    }
    Py_XDECREF(inst->memory);
    inst->memory = r;  // keep bytes alive on the instance
    char *buf = nullptr;
    Py_ssize_t size = 0;
    if (PyBytes_AsStringAndSize(r, &buf, &size) != 0) return nullptr;
    *out_size = static_cast<size_t>(size);
    return reinterpret_cast<const obj2voxel_byte_t *>(buf);
}

// ---------------------------------------------------------------------------
// triangle setters (plain C structs; no Python involved)
// ---------------------------------------------------------------------------

extern "C" void obj2voxel_set_triangle_basic(obj2voxel_triangle *tri,
                                             const float vertices[9]) {
    tri->type = 1;
    std::memcpy(tri->vertices, vertices, sizeof(tri->vertices));
    tri->texture = nullptr;
}

extern "C" void obj2voxel_set_triangle_colored(obj2voxel_triangle *tri,
                                               const float vertices[9],
                                               const float color[3]) {
    tri->type = 2;
    std::memcpy(tri->vertices, vertices, sizeof(tri->vertices));
    std::memcpy(tri->color, color, sizeof(tri->color));
    tri->texture = nullptr;
}

extern "C" void obj2voxel_set_triangle_textured(obj2voxel_triangle *tri,
                                                const float vertices[9],
                                                const float textures[6],
                                                obj2voxel_texture *texture) {
    tri->type = 3;
    std::memcpy(tri->vertices, vertices, sizeof(tri->vertices));
    std::memcpy(tri->uvs, textures, sizeof(tri->uvs));
    tri->texture = texture;
}

// ---------------------------------------------------------------------------
// textures
// ---------------------------------------------------------------------------

extern "C" obj2voxel_texture *obj2voxel_texture_alloc(void) {
    GilGuard gil;
    PyObject *mod = api_module();
    if (!mod) return nullptr;
    PyObject *tex_py = PyObject_CallMethod(mod, "Texture", nullptr);
    Py_DECREF(mod);
    if (!tex_py) return nullptr;
    auto *tex = new obj2voxel_texture;
    tex->py = tex_py;
    return tex;
}

extern "C" void obj2voxel_texture_free(obj2voxel_texture *texture) {
    if (!texture) return;
    {
        GilGuard gil;
        Py_XDECREF(texture->py);
    }
    delete texture;
}

static bool call_bool(PyObject *, PyObject *r, const char *where) {
    if (!r) {
        print_py_error(where);
        return false;
    }
    bool ok = PyObject_IsTrue(r) == 1;
    Py_DECREF(r);
    return ok;
}

extern "C" bool obj2voxel_texture_load_from_file(obj2voxel_texture *tex,
                                                 const char *file, const char *type) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(tex->py, "load_from_file", "sz", file, type);
    return call_bool(tex->py, r, "load_from_file");
}

extern "C" bool obj2voxel_texture_load_from_memory(obj2voxel_texture *tex,
                                                   const obj2voxel_byte_t *data,
                                                   size_t size, const char *type) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(tex->py, "load_from_memory", "y#z",
                                      reinterpret_cast<const char *>(data),
                                      (Py_ssize_t)size, type);
    return call_bool(tex->py, r, "load_from_memory");
}

extern "C" bool obj2voxel_texture_load_pixels(obj2voxel_texture *tex,
                                              const obj2voxel_byte_t *pixels,
                                              size_t width, size_t height,
                                              size_t channels) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(
        tex->py, "load_pixels", "y#nnn",
        reinterpret_cast<const char *>(pixels),
        (Py_ssize_t)(width * height * channels), (Py_ssize_t)width,
        (Py_ssize_t)height, (Py_ssize_t)channels);
    return call_bool(tex->py, r, "load_pixels");
}

extern "C" void obj2voxel_texture_set_uv_mode(obj2voxel_texture *tex,
                                              obj2voxel_enum_t mode) {
    GilGuard gil;
    call_void(tex->py, "set_uv_mode", "(i)", (int)mode);
}

extern "C" void obj2voxel_teture_set_uv_mode(obj2voxel_texture *tex,
                                             obj2voxel_enum_t mode) {
    obj2voxel_texture_set_uv_mode(tex, mode);
}

extern "C" void obj2voxel_texture_get_meta(obj2voxel_texture *tex, size_t *out_width,
                                           size_t *out_height, size_t *out_channels) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(tex->py, "get_meta", nullptr);
    if (!r) return;
    PyObject *w, *h, *c;
    if (PyArg_ParseTuple(r, "OOO", &w, &h, &c)) {
        *out_width = (size_t)PyLong_AsSsize_t(w);
        *out_height = (size_t)PyLong_AsSsize_t(h);
        *out_channels = (size_t)PyLong_AsSsize_t(c);
    }
    Py_DECREF(r);
}

extern "C" void obj2voxel_texture_get_pixels(obj2voxel_texture *tex,
                                             obj2voxel_byte_t *out_pixels) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(tex->py, "get_pixels", nullptr);
    if (!r) return;
    Py_buffer view;
    if (PyObject_GetBuffer(r, &view, PyBUF_C_CONTIGUOUS) == 0) {
        std::memcpy(out_pixels, view.buf, (size_t)view.len);
        PyBuffer_Release(&view);
    }
    Py_DECREF(r);
}

// ---------------------------------------------------------------------------
// threading contract
// ---------------------------------------------------------------------------

extern "C" void obj2voxel_run_worker(obj2voxel_instance *inst) {
    // The TPU engine does all compute on-device; worker threads merely park
    // until stopped so the caller's spawn/stop/join pattern keeps working
    // (reference obj2voxel.cpp:957-996).
    std::unique_lock<std::mutex> lock(inst->worker_mutex);
    if (inst->workers_stopped) return;
    ++inst->worker_count;
    inst->worker_cv.wait(lock, [&] { return inst->workers_stopped; });
}

extern "C" void obj2voxel_stop_workers(obj2voxel_instance *inst) {
    {
        std::lock_guard<std::mutex> lock(inst->worker_mutex);
        inst->workers_stopped = true;
        inst->worker_count = 0;
    }
    inst->worker_cv.notify_all();
}

extern "C" uint32_t obj2voxel_get_worker_count(obj2voxel_instance *inst) {
    std::lock_guard<std::mutex> lock(inst->worker_mutex);
    return inst->worker_count;
}

// ---------------------------------------------------------------------------
// voxelization
// ---------------------------------------------------------------------------

extern "C" obj2voxel_error_t obj2voxel_voxelize(obj2voxel_instance *inst) {
    GilGuard gil;
    PyObject *r = PyObject_CallMethod(inst->py, "voxelize", nullptr);
    if (!r) {
        print_py_error("voxelize");
        return OBJ2VOXEL_ERR_IO_ERROR_DURING_VOXEL_WRITE;
    }
    long code = PyLong_AsLong(r);
    Py_DECREF(r);
    return static_cast<obj2voxel_error_t>(code);
}
