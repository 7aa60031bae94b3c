/* Native host-side augmentation kernels for the input pipeline.
 *
 * The training hot loop's host side is crop + dihedral transform + batch
 * collation over float32 HWC arrays (freqfusion_tpu/data/augment.py).
 * numpy does these as separate strided copies per array; this extension
 * fuses crop+flip+rotate into one pass and is released from the GIL, so
 * the PrefetchLoader's worker threads scale.
 *
 * API (all float32, C-contiguous):
 *   crop_geom(src[H,W,C], top, left, out_h, out_w, hflip, vflip, rot_k)
 *       -> [out_h', out_w', C]  (rot_k swaps dims for odd k)
 *
 * Built by scripts/build_native.py via setuptools; freqfusion_tpu.data
 * falls back to numpy when the extension is absent.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <string.h>

/* map output (i, j) to source (si, sj) for the inverse dihedral transform:
 * the output is rot90^k(flip(src_crop)); we iterate output pixels and pull. */
static inline void src_index(long i, long j, long oh, long ow,
                             int hflip, int vflip, int rot_k,
                             long ch, long cw, long *si, long *sj) {
    long a, b;
    /* invert rotation: output = rot90^k(x) with x[ch, cw];
       rot90 (numpy, axes (0,1)): out[i][j] = x[j][cw-1-i] for k=1 */
    /* np.rot90 is counterclockwise: k=1 -> out[i][j] = x[j][cw-1-i] */
    switch (rot_k & 3) {
        case 0: a = i;          b = j;          break;
        case 1: a = j;          b = cw - 1 - i; break;
        case 2: a = ch - 1 - i; b = cw - 1 - j; break;
        default: a = ch - 1 - j; b = i;         break;  /* k=3 */
    }
    /* invert flips applied before rotation */
    if (vflip) a = ch - 1 - a;
    if (hflip) b = cw - 1 - b;
    *si = a;
    *sj = b;
}

static PyObject *crop_geom(PyObject *self, PyObject *args) {
    PyArrayObject *src;
    long top, left, ch, cw;
    int hflip, vflip, rot_k;
    if (!PyArg_ParseTuple(args, "O!llllppi", &PyArray_Type, &src,
                          &top, &left, &ch, &cw, &hflip, &vflip, &rot_k))
        return NULL;
    if (PyArray_TYPE(src) != NPY_FLOAT32 || PyArray_NDIM(src) != 3 ||
        !PyArray_IS_C_CONTIGUOUS(src)) {
        PyErr_SetString(PyExc_TypeError,
                        "src must be C-contiguous float32 [H, W, C]");
        return NULL;
    }
    long H = (long)PyArray_DIM(src, 0);
    long W = (long)PyArray_DIM(src, 1);
    long C = (long)PyArray_DIM(src, 2);
    if (top < 0 || left < 0 || top + ch > H || left + cw > W) {
        PyErr_SetString(PyExc_ValueError, "crop out of bounds");
        return NULL;
    }

    long oh = (rot_k & 1) ? cw : ch;
    long ow = (rot_k & 1) ? ch : cw;
    npy_intp dims[3] = {oh, ow, C};
    PyArrayObject *out =
        (PyArrayObject *)PyArray_SimpleNew(3, dims, NPY_FLOAT32);
    if (!out) return NULL;

    const float *s = (const float *)PyArray_DATA(src);
    float *o = (float *)PyArray_DATA(out);

    Py_BEGIN_ALLOW_THREADS
    if (rot_k == 0 && !hflip && !vflip) {
        for (long i = 0; i < oh; i++)
            memcpy(o + (size_t)i * ow * C,
                   s + ((size_t)(top + i) * W + left) * C,
                   (size_t)ow * C * sizeof(float));
    } else {
        for (long i = 0; i < oh; i++) {
            for (long j = 0; j < ow; j++) {
                long si, sj;
                src_index(i, j, oh, ow, hflip, vflip, rot_k, ch, cw, &si, &sj);
                memcpy(o + ((size_t)i * ow + j) * C,
                       s + ((size_t)(top + si) * W + (left + sj)) * C,
                       (size_t)C * sizeof(float));
            }
        }
    }
    Py_END_ALLOW_THREADS

    return (PyObject *)out;
}

static PyMethodDef Methods[] = {
    {"crop_geom", crop_geom, METH_VARARGS,
     "Fused crop + dihedral transform on float32 HWC arrays."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_augmentc", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__augmentc(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
