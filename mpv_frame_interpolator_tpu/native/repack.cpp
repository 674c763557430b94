// _mfi_native: host-side frame data-path primitives.
//
// The reference's hot host paths are C inside mpv: mp_image plane copies
// (video/mp_image.c), the recycling frame pool (video/mp_image_pool.c), and
// libswscale repacks (video/repack.c).  This extension is the rebuild's
// native equivalent for the TPU host: NV12 chroma (de)interleave and planar
// I420<->biplanar conversions run as tight C++ loops over the buffer
// protocol (the 1-core pipeline host cannot afford numpy fancy-indexing
// copies at 4K120 rates), plus an aligned recycling buffer pool.
//
// Built with setuptools (setup.py) against the CPython C API only.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BufView {
    Py_buffer view{};
    bool ok = false;
    ~BufView() {
        if (ok) PyBuffer_Release(&view);
    }
    bool acquire(PyObject* obj, int flags) {
        if (PyObject_GetBuffer(obj, &view, flags) != 0) return false;
        ok = true;
        return true;
    }
};

// interleave_chroma(u, v, out): planar u,v (h, w) -> out (h, 2w) as UVUV...
template <typename T>
void interleave_rows(const T* u, const T* v, T* out, Py_ssize_t h,
                     Py_ssize_t w, Py_ssize_t su, Py_ssize_t sv,
                     Py_ssize_t so) {
    for (Py_ssize_t y = 0; y < h; y++) {
        const T* ur = u + y * su;
        const T* vr = v + y * sv;
        T* orow = out + y * so;
        for (Py_ssize_t x = 0; x < w; x++) {
            orow[2 * x] = ur[x];
            orow[2 * x + 1] = vr[x];
        }
    }
}

template <typename T>
void deinterleave_rows(const T* uv, T* u, T* v, Py_ssize_t h, Py_ssize_t w,
                       Py_ssize_t suv, Py_ssize_t su, Py_ssize_t sv) {
    for (Py_ssize_t y = 0; y < h; y++) {
        const T* row = uv + y * suv;
        T* ur = u + y * su;
        T* vr = v + y * sv;
        for (Py_ssize_t x = 0; x < w; x++) {
            ur[x] = row[2 * x];
            vr[x] = row[2 * x + 1];
        }
    }
}

// Common entry: validates 2-D contiguous-ish buffers of 1- or 2-byte items.
static bool check2d(const Py_buffer& b, const char* name) {
    if (b.ndim != 2) {
        PyErr_Format(PyExc_ValueError, "%s must be 2-D", name);
        return false;
    }
    if (b.itemsize != 1 && b.itemsize != 2) {
        PyErr_Format(PyExc_ValueError, "%s must be uint8/uint16", name);
        return false;
    }
    if (b.strides[1] != b.itemsize) {
        PyErr_Format(PyExc_ValueError, "%s rows must be contiguous", name);
        return false;
    }
    return true;
}

static PyObject* py_interleave(PyObject*, PyObject* args) {
    PyObject *uo, *vo, *oo;
    if (!PyArg_ParseTuple(args, "OOO", &uo, &vo, &oo)) return nullptr;
    BufView u, v, o;
    if (!u.acquire(uo, PyBUF_RECORDS_RO) || !v.acquire(vo, PyBUF_RECORDS_RO)
        || !o.acquire(oo, PyBUF_RECORDS))
        return nullptr;
    if (!check2d(u.view, "u") || !check2d(v.view, "v") || !check2d(o.view, "out"))
        return nullptr;
    Py_ssize_t h = u.view.shape[0], w = u.view.shape[1];
    if (v.view.shape[0] != h || v.view.shape[1] != w ||
        o.view.shape[0] != h || o.view.shape[1] != 2 * w ||
        u.view.itemsize != v.view.itemsize ||
        u.view.itemsize != o.view.itemsize) {
        PyErr_SetString(PyExc_ValueError, "shape/itemsize mismatch");
        return nullptr;
    }
    Py_BEGIN_ALLOW_THREADS
    if (u.view.itemsize == 1) {
        interleave_rows((const uint8_t*)u.view.buf, (const uint8_t*)v.view.buf,
                        (uint8_t*)o.view.buf, h, w, u.view.strides[0],
                        v.view.strides[0], o.view.strides[0]);
    } else {
        interleave_rows((const uint16_t*)u.view.buf,
                        (const uint16_t*)v.view.buf, (uint16_t*)o.view.buf, h,
                        w, u.view.strides[0] / 2, v.view.strides[0] / 2,
                        o.view.strides[0] / 2);
    }
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

static PyObject* py_deinterleave(PyObject*, PyObject* args) {
    PyObject *uvo, *uo, *vo;
    if (!PyArg_ParseTuple(args, "OOO", &uvo, &uo, &vo)) return nullptr;
    BufView uv, u, v;
    if (!uv.acquire(uvo, PyBUF_RECORDS_RO) || !u.acquire(uo, PyBUF_RECORDS)
        || !v.acquire(vo, PyBUF_RECORDS))
        return nullptr;
    if (!check2d(uv.view, "uv") || !check2d(u.view, "u") || !check2d(v.view, "v"))
        return nullptr;
    Py_ssize_t h = u.view.shape[0], w = u.view.shape[1];
    if (v.view.shape[0] != h || v.view.shape[1] != w ||
        uv.view.shape[0] != h || uv.view.shape[1] != 2 * w ||
        uv.view.itemsize != u.view.itemsize ||
        uv.view.itemsize != v.view.itemsize) {
        PyErr_SetString(PyExc_ValueError, "shape/itemsize mismatch");
        return nullptr;
    }
    Py_BEGIN_ALLOW_THREADS
    if (u.view.itemsize == 1) {
        deinterleave_rows((const uint8_t*)uv.view.buf, (uint8_t*)u.view.buf,
                          (uint8_t*)v.view.buf, h, w, uv.view.strides[0],
                          u.view.strides[0], v.view.strides[0]);
    } else {
        deinterleave_rows((const uint16_t*)uv.view.buf, (uint16_t*)u.view.buf,
                          (uint16_t*)v.view.buf, h, w, uv.view.strides[0] / 2,
                          u.view.strides[0] / 2, v.view.strides[0] / 2);
    }
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

// ---------------------------------------------------------------------
// BufferPool: recycling aligned allocator (mp_image_pool analog,
// video/mp_image_pool.c -- HopperRender draws every output frame from one,
// vf_HopperRender.c:385,699).
// ---------------------------------------------------------------------

struct PoolEntry {
    void* ptr;
    size_t size;
};

struct PoolObject {
    PyObject_HEAD
    std::vector<PoolEntry>* free_list;
    size_t max_entries;
    size_t hits, misses;
};

static PyObject* pool_get(PyObject* self_, PyObject* args) {
    PoolObject* self = (PoolObject*)self_;
    Py_ssize_t size;
    if (!PyArg_ParseTuple(args, "n", &size)) return nullptr;
    void* ptr = nullptr;
    for (size_t i = 0; i < self->free_list->size(); i++) {
        if ((*self->free_list)[i].size == (size_t)size) {
            ptr = (*self->free_list)[i].ptr;
            self->free_list->erase(self->free_list->begin() + i);
            self->hits++;
            break;
        }
    }
    if (!ptr) {
        if (posix_memalign(&ptr, 128, (size_t)size) != 0)
            return PyErr_NoMemory();
        self->misses++;
    }
    // hand out as a writable memoryview; the Python wrapper returns it via
    // give_back() when the frame is recycled
    return PyMemoryView_FromMemory((char*)ptr, size, PyBUF_WRITE);
}

static PyObject* pool_give_back(PyObject* self_, PyObject* args) {
    PoolObject* self = (PoolObject*)self_;
    PyObject* mv;
    if (!PyArg_ParseTuple(args, "O", &mv)) return nullptr;
    if (!PyMemoryView_Check(mv)) {
        PyErr_SetString(PyExc_TypeError, "expected a memoryview from get()");
        return nullptr;
    }
    Py_buffer* b = PyMemoryView_GET_BUFFER(mv);
    if (self->free_list->size() >= self->max_entries) {
        free(b->buf);
    } else {
        self->free_list->push_back({b->buf, (size_t)b->len});
    }
    Py_RETURN_NONE;
}

static PyObject* pool_stats(PyObject* self_, PyObject*) {
    PoolObject* self = (PoolObject*)self_;
    return Py_BuildValue("{s:n,s:n,s:n}", "hits", (Py_ssize_t)self->hits,
                         "misses", (Py_ssize_t)self->misses, "free",
                         (Py_ssize_t)self->free_list->size());
}

static void pool_dealloc(PyObject* self_) {
    PoolObject* self = (PoolObject*)self_;
    for (auto& e : *self->free_list) free(e.ptr);
    delete self->free_list;
    Py_TYPE(self)->tp_free(self_);
}

static PyObject* pool_new(PyTypeObject* type, PyObject* args, PyObject*) {
    Py_ssize_t max_entries = 16;
    if (!PyArg_ParseTuple(args, "|n", &max_entries)) return nullptr;
    PoolObject* self = (PoolObject*)type->tp_alloc(type, 0);
    if (!self) return nullptr;
    self->free_list = new std::vector<PoolEntry>();
    self->max_entries = (size_t)max_entries;
    self->hits = self->misses = 0;
    return (PyObject*)self;
}

static PyMethodDef pool_methods[] = {
    {"get", pool_get, METH_VARARGS,
     "get(nbytes) -> memoryview over a 128-byte-aligned buffer"},
    {"give_back", pool_give_back, METH_VARARGS,
     "return a buffer obtained from get() to the pool"},
    {"stats", pool_stats, METH_NOARGS, "pool hit/miss/free counts"},
    {nullptr, nullptr, 0, nullptr},
};

static PyTypeObject PoolType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

static PyMethodDef module_methods[] = {
    {"interleave_chroma", py_interleave, METH_VARARGS,
     "interleave_chroma(u, v, out): planar -> NV12 UV plane"},
    {"deinterleave_chroma", py_deinterleave, METH_VARARGS,
     "deinterleave_chroma(uv, u, v): NV12 UV plane -> planar"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_mfi_native",
    "Native host data path: NV12 repack + recycling buffer pool", -1,
    module_methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__mfi_native(void) {
    PyObject* m = PyModule_Create(&moduledef);
    if (!m) return nullptr;
    PoolType.tp_name = "_mfi_native.BufferPool";
    PoolType.tp_basicsize = sizeof(PoolObject);
    PoolType.tp_flags = Py_TPFLAGS_DEFAULT;
    PoolType.tp_new = pool_new;
    PoolType.tp_dealloc = pool_dealloc;
    PoolType.tp_methods = pool_methods;
    PoolType.tp_doc = "Recycling aligned buffer pool (mp_image_pool analog)";
    if (PyType_Ready(&PoolType) < 0) return nullptr;
    Py_INCREF(&PoolType);
    PyModule_AddObject(m, "BufferPool", (PyObject*)&PoolType);
    return m;
}
