/* _fastdata — native chunk sampling + zero-padded batch assembly.
 *
 * The host-side hot loop of the input pipeline: the Python
 * RandomChunkDataset/collate path (vqvaehmm_tpu/data/dataset.py,
 * reproducing reference VQ_VAE_HMM_fixed.py:10-29,164-179) allocates and
 * copies per item, per batch, per epoch in the interpreter.  This C
 * extension assembles a whole stacked epoch — (N, B, C, pad_to) x-batches,
 * (N, B, U, pad_to) u-batches, (N, B) lengths — in one call with a
 * deterministic xoshiro256** stream, so the feeding thread keeps TPU steps
 * from going input-bound.
 *
 * Exposes:
 *   sample_epoch(x_seqs, u_seqs, num_batches, batch_size, min_len,
 *                max_len, pad_to, seed) -> (x, u, lengths)
 * where x_seqs/u_seqs are lists of C-contiguous float32 arrays shaped
 * (C, T_i) / (U, T_i).
 */

#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>
#include <stdint.h>
#include <string.h>

/* ---- xoshiro256** (public-domain algorithm) ---- */

typedef struct { uint64_t s[4]; } rng_t;

static inline uint64_t rotl(const uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
}

static uint64_t splitmix64(uint64_t *state) {
    uint64_t z = (*state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static void rng_seed(rng_t *r, uint64_t seed) {
    for (int i = 0; i < 4; i++) r->s[i] = splitmix64(&seed);
}

static inline uint64_t rng_next(rng_t *r) {
    const uint64_t result = rotl(r->s[1] * 5, 7) * 9;
    const uint64_t t = r->s[1] << 17;
    r->s[2] ^= r->s[0];
    r->s[3] ^= r->s[1];
    r->s[1] ^= r->s[2];
    r->s[0] ^= r->s[3];
    r->s[2] ^= t;
    r->s[3] = rotl(r->s[3], 45);
    return result;
}

/* uniform integer in [0, n) without modulo bias (n < 2^32) */
static inline uint32_t rng_below(rng_t *r, uint32_t n) {
    uint64_t x = rng_next(r);
    uint64_t m = (uint64_t)(uint32_t)x * (uint64_t)n;
    uint32_t l = (uint32_t)m;
    if (l < n) {
        uint32_t t = (uint32_t)(-(int32_t)n) % n;
        while (l < t) {
            x = rng_next(r);
            m = (uint64_t)(uint32_t)x * (uint64_t)n;
            l = (uint32_t)m;
        }
    }
    return (uint32_t)(m >> 32);
}

/* ---- sequence pool parsed from the Python lists ---- */

typedef struct {
    const float *x;  /* (C, T) contiguous */
    const float *u;  /* (U, T) contiguous */
    npy_intp T;
} seq_t;

static int parse_pool(PyObject *x_list, PyObject *u_list, seq_t **out,
                      npy_intp *n_seqs, npy_intp *C, npy_intp *U) {
    if (!PyList_Check(x_list) || !PyList_Check(u_list)) {
        PyErr_SetString(PyExc_TypeError, "x_seqs/u_seqs must be lists");
        return -1;
    }
    npy_intp n = PyList_GET_SIZE(x_list);
    if (n == 0 || n != PyList_GET_SIZE(u_list)) {
        PyErr_SetString(PyExc_ValueError,
                        "x_seqs/u_seqs must be equal-length, non-empty");
        return -1;
    }
    seq_t *pool = (seq_t *)PyMem_Malloc(sizeof(seq_t) * n);
    if (!pool) { PyErr_NoMemory(); return -1; }
    *C = -1; *U = -1;
    for (npy_intp i = 0; i < n; i++) {
        PyArrayObject *xa = (PyArrayObject *)PyList_GET_ITEM(x_list, i);
        PyArrayObject *ua = (PyArrayObject *)PyList_GET_ITEM(u_list, i);
        if (!PyArray_Check(xa) || !PyArray_Check(ua) ||
            PyArray_TYPE(xa) != NPY_FLOAT32 ||
            PyArray_TYPE(ua) != NPY_FLOAT32 ||
            PyArray_NDIM(xa) != 2 || PyArray_NDIM(ua) != 2 ||
            !PyArray_IS_C_CONTIGUOUS(xa) || !PyArray_IS_C_CONTIGUOUS(ua)) {
            PyMem_Free(pool);
            PyErr_SetString(PyExc_TypeError,
                "sequences must be C-contiguous float32 arrays (C, T)");
            return -1;
        }
        npy_intp Ci = PyArray_DIM(xa, 0), Ui = PyArray_DIM(ua, 0);
        npy_intp Ti = PyArray_DIM(xa, 1);
        if (PyArray_DIM(ua, 1) != Ti) {
            PyMem_Free(pool);
            PyErr_SetString(PyExc_ValueError, "x/u time dims must match");
            return -1;
        }
        if (*C < 0) { *C = Ci; *U = Ui; }
        else if (Ci != *C || Ui != *U) {
            PyMem_Free(pool);
            PyErr_SetString(PyExc_ValueError,
                            "all sequences must share feature dims");
            return -1;
        }
        pool[i].x = (const float *)PyArray_DATA(xa);
        pool[i].u = (const float *)PyArray_DATA(ua);
        pool[i].T = Ti;
    }
    *out = pool;
    *n_seqs = n;
    return 0;
}

static PyObject *sample_epoch(PyObject *self, PyObject *args) {
    PyObject *x_list, *u_list;
    Py_ssize_t num_batches, batch_size;
    long min_len, max_len, pad_to;
    unsigned long long seed;
    if (!PyArg_ParseTuple(args, "OOnnlllK", &x_list, &u_list, &num_batches,
                          &batch_size, &min_len, &max_len, &pad_to, &seed))
        return NULL;
    if (min_len < 1 || max_len < min_len || pad_to < max_len) {
        PyErr_SetString(PyExc_ValueError,
                        "need 1 <= min_len <= max_len <= pad_to");
        return NULL;
    }

    seq_t *pool;
    npy_intp n_seqs, C, U;
    if (parse_pool(x_list, u_list, &pool, &n_seqs, &C, &U) < 0) return NULL;
    for (npy_intp i = 0; i < n_seqs; i++) {
        if (pool[i].T < min_len) {
            PyMem_Free(pool);
            PyErr_SetString(PyExc_ValueError,
                            "every sequence must be >= min_len long");
            return NULL;
        }
    }

    npy_intp dx[4] = {num_batches, batch_size, C, pad_to};
    npy_intp du[4] = {num_batches, batch_size, U, pad_to};
    npy_intp dl[2] = {num_batches, batch_size};
    PyArrayObject *xb = (PyArrayObject *)PyArray_ZEROS(4, dx, NPY_FLOAT32, 0);
    PyArrayObject *ub = (PyArrayObject *)PyArray_ZEROS(4, du, NPY_FLOAT32, 0);
    PyArrayObject *lb = (PyArrayObject *)PyArray_ZEROS(2, dl, NPY_INT32, 0);
    if (!xb || !ub || !lb) {
        Py_XDECREF(xb); Py_XDECREF(ub); Py_XDECREF(lb);
        PyMem_Free(pool);
        return PyErr_NoMemory();
    }

    float *xd = (float *)PyArray_DATA(xb);
    float *ud = (float *)PyArray_DATA(ub);
    int32_t *ld = (int32_t *)PyArray_DATA(lb);

    rng_t rng;
    rng_seed(&rng, (uint64_t)seed);

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t b = 0; b < num_batches * batch_size; b++) {
        const seq_t *s = &pool[rng_below(&rng, (uint32_t)n_seqs)];
        long hi = s->T < max_len ? (long)s->T : max_len;
        long L = min_len + (long)rng_below(&rng, (uint32_t)(hi - min_len + 1));
        long start = (long)rng_below(&rng, (uint32_t)(s->T - L + 1));

        float *xrow = xd + (npy_intp)b * C * pad_to;
        float *urow = ud + (npy_intp)b * U * pad_to;
        for (npy_intp c = 0; c < C; c++)
            memcpy(xrow + c * pad_to, s->x + c * s->T + start,
                   sizeof(float) * (size_t)L);
        for (npy_intp c = 0; c < U; c++)
            memcpy(urow + c * pad_to, s->u + c * s->T + start,
                   sizeof(float) * (size_t)L);
        ld[b] = (int32_t)L;
    }
    Py_END_ALLOW_THREADS

    PyMem_Free(pool);
    PyObject *out = Py_BuildValue("NNN", xb, ub, lb);
    return out;
}

static PyMethodDef methods[] = {
    {"sample_epoch", sample_epoch, METH_VARARGS,
     "sample_epoch(x_seqs, u_seqs, num_batches, batch_size, min_len, "
     "max_len, pad_to, seed) -> (x, u, lengths)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastdata",
    "Native chunk sampling + batch assembly", -1, methods,
};

PyMODINIT_FUNC PyInit__fastdata(void) {
    PyObject *m = PyModule_Create(&moduledef);
    if (!m) return NULL;
    import_array();
    return m;
}
