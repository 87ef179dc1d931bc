/* Native COCO RLE mask kernels (CPython extension).
 *
 * TPU-native replacement for the reference's pycocotools C backend
 * (reference: pycocotools/common/maskApi.c as consumed by
 * mmdet/core/mask/utils.py:encode_mask_results and the COCOeval IoU
 * stage). Same wire format — column-major run lengths, 6-bit varint
 * strings with second-order deltas — implemented from the format spec,
 * with the pairwise IoU computed directly in the run-length domain
 * (O(runs) per pair instead of the dense O(h*w) numpy fallback in
 * data/mask_codec.py).
 *
 * API (bytes in, bytes/level objects out — no numpy C API dependency):
 *   decode(s, h, w)        -> column-major uint8 mask bytes
 *   encode(mask, h, w)     -> varint counts string (mask: column-major
 *                             uint8 bytes, any nonzero = 1)
 *   area(s)                -> int, number of 1 pixels
 *   iou(dets, gts, iscrowd)-> list[float], row-major len(dets)*len(gts);
 *                             crowd gt => intersection / det_area (IoF)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>
#include <string.h>

/* ----------------------------------------------------------- varints */

/* varint string -> malloc'd run counts; returns count, -1 on alloc
 * failure, or -2 when a decoded run length is negative (malformed
 * input). Counts use second-order deltas: x += cnts[m-2] for m > 2. */
static Py_ssize_t
str_to_counts(const char *s, Py_ssize_t slen, long long **out)
{
    long long *cnts = (long long *)malloc(sizeof(long long) *
                                          ((size_t)slen + 1));
    Py_ssize_t m = 0, i = 0;
    if (!cnts)
        return -1;
    while (i < slen) {
        long long x = 0;
        int k = 0, more = 1;
        char c = 0;
        while (more && i < slen) {
            c = (char)(s[i] - 48);
            x |= ((long long)(c & 0x1f)) << (5 * k);
            more = c & 0x20;
            i++;
            k++;
        }
        if (!more && (c & 0x10))
            x |= -1LL << (5 * k);
        if (m > 2)
            x += cnts[m - 2];
        if (x < 0) {
            free(cnts);
            return -2;
        }
        cnts[m++] = x;
    }
    *out = cnts;
    return m;
}

static PyObject *
counts_error(Py_ssize_t m)
{
    if (m == -2) {
        PyErr_SetString(PyExc_ValueError, "negative run length in rle");
        return NULL;
    }
    return PyErr_NoMemory();
}

/* run counts -> varint bytes appended into a growable buffer */
static PyObject *
counts_to_str(const long long *cnts, Py_ssize_t m)
{
    /* worst case ~15 bytes per count */
    char *buf = (char *)malloc((size_t)m * 16 + 1);
    Py_ssize_t o = 0, i;
    PyObject *res;
    if (!buf)
        return PyErr_NoMemory();
    for (i = 0; i < m; i++) {
        long long x = cnts[i];
        int more = 1;
        if (i > 2)
            x -= cnts[i - 2];
        while (more) {
            char ch = (char)(x & 0x1f);
            x >>= 5;
            more = (ch & 0x10) ? (x != -1) : (x != 0);
            if (more)
                ch |= 0x20;
            buf[o++] = (char)(ch + 48);
        }
    }
    res = PyBytes_FromStringAndSize(buf, o);
    free(buf);
    return res;
}

/* ------------------------------------------------------------ decode */

static PyObject *
maskc_decode(PyObject *self, PyObject *args)
{
    Py_buffer sb;
    long h, w;
    long long *cnts = NULL;
    Py_ssize_t m, i;
    long long total = 0, pos = 0;
    PyObject *out;
    char *dst;

    if (!PyArg_ParseTuple(args, "y*ll", &sb, &h, &w))
        return NULL;
    m = str_to_counts((const char *)sb.buf, sb.len, &cnts);
    PyBuffer_Release(&sb);
    if (m < 0)
        return counts_error(m);
    for (i = 0; i < m; i++)
        total += cnts[i];
    if (total != (long long)h * w) {
        free(cnts);
        PyErr_Format(PyExc_ValueError,
                     "rle covers %lld pixels, expected %ld*%ld",
                     total, h, w);
        return NULL;
    }
    /* bytearray: numpy views of it stay writable, matching the numpy
     * fallback's mutability */
    out = PyByteArray_FromStringAndSize(NULL, (Py_ssize_t)total);
    if (!out) {
        free(cnts);
        return NULL;
    }
    dst = PyByteArray_AS_STRING(out);
    for (i = 0; i < m; i++) {
        memset(dst + pos, (int)(i & 1), (size_t)cnts[i]);
        pos += cnts[i];
    }
    free(cnts);
    return out;
}

/* ------------------------------------------------------------ encode */

static PyObject *
maskc_encode(PyObject *self, PyObject *args)
{
    Py_buffer mb;
    long h, w;
    long long *cnts;
    Py_ssize_t m = 0, i, n;
    const char *p;
    int cur = 0;
    long long run = 0;
    PyObject *res;

    if (!PyArg_ParseTuple(args, "y*ll", &mb, &h, &w))
        return NULL;
    n = (Py_ssize_t)h * w;
    if (mb.len != n) {
        PyBuffer_Release(&mb);
        PyErr_SetString(PyExc_ValueError, "mask buffer size != h*w");
        return NULL;
    }
    cnts = (long long *)malloc(sizeof(long long) * ((size_t)n + 2));
    if (!cnts) {
        PyBuffer_Release(&mb);
        return PyErr_NoMemory();
    }
    p = (const char *)mb.buf;
    for (i = 0; i < n; i++) {
        int v = p[i] != 0;
        if (v == cur) {
            run++;
        } else {
            cnts[m++] = run;
            run = 1;
            cur = v;
        }
    }
    cnts[m++] = run;
    PyBuffer_Release(&mb);
    res = counts_to_str(cnts, m);
    free(cnts);
    return res;
}

/* -------------------------------------------------------------- area */

static long long
rle_area_counts(const long long *cnts, Py_ssize_t m)
{
    long long a = 0;
    Py_ssize_t i;
    for (i = 1; i < m; i += 2)
        a += cnts[i];
    return a;
}

static PyObject *
maskc_area(PyObject *self, PyObject *args)
{
    Py_buffer sb;
    long long *cnts = NULL;
    Py_ssize_t m;
    long long a;

    if (!PyArg_ParseTuple(args, "y*", &sb))
        return NULL;
    m = str_to_counts((const char *)sb.buf, sb.len, &cnts);
    PyBuffer_Release(&sb);
    if (m < 0)
        return counts_error(m);
    a = rle_area_counts(cnts, m);
    free(cnts);
    return PyLong_FromLongLong(a);
}

/* --------------------------------------------------------------- iou */

/* intersection of 1-runs of two run-length sequences */
static double
inter_ones(const long long *a, Py_ssize_t na,
           const long long *b, Py_ssize_t nb)
{
    Py_ssize_t ia = 0, ib = 0;
    int va = 0, vb = 0;
    long long ca = na ? a[0] : 0, cb = nb ? b[0] : 0;
    double inter = 0.0;

    for (;;) {
        while (ca == 0 && ia + 1 < na) {
            ia++;
            va ^= 1;
            ca = a[ia];
        }
        while (cb == 0 && ib + 1 < nb) {
            ib++;
            vb ^= 1;
            cb = b[ib];
        }
        if (ca == 0 || cb == 0)
            break;
        {
            long long mrun = ca < cb ? ca : cb;
            if (va && vb)
                inter += (double)mrun;
            ca -= mrun;
            cb -= mrun;
        }
    }
    return inter;
}

static PyObject *
maskc_iou(PyObject *self, PyObject *args)
{
    PyObject *dets, *gts, *crowd, *out = NULL;
    Py_ssize_t nd, ng, i, j;
    long long **dc = NULL, **gc = NULL;
    Py_ssize_t *dn = NULL, *gn = NULL;
    double *darea = NULL, *garea = NULL;
    char *iscrowd = NULL;

    if (!PyArg_ParseTuple(args, "OOO", &dets, &gts, &crowd))
        return NULL;
    nd = PySequence_Length(dets);
    ng = PySequence_Length(gts);
    if (nd < 0 || ng < 0)
        return NULL;

    dc = (long long **)calloc((size_t)nd ? (size_t)nd : 1, sizeof(*dc));
    gc = (long long **)calloc((size_t)ng ? (size_t)ng : 1, sizeof(*gc));
    dn = (Py_ssize_t *)calloc((size_t)nd ? (size_t)nd : 1, sizeof(*dn));
    gn = (Py_ssize_t *)calloc((size_t)ng ? (size_t)ng : 1, sizeof(*gn));
    darea = (double *)calloc((size_t)nd ? (size_t)nd : 1, sizeof(*darea));
    garea = (double *)calloc((size_t)ng ? (size_t)ng : 1, sizeof(*garea));
    iscrowd = (char *)calloc((size_t)ng ? (size_t)ng : 1, 1);
    if (!dc || !gc || !dn || !gn || !darea || !garea || !iscrowd) {
        PyErr_NoMemory();
        goto fail;
    }

    for (i = 0; i < nd; i++) {
        PyObject *it = PySequence_GetItem(dets, i);
        Py_buffer sb;
        if (!it || PyObject_GetBuffer(it, &sb, PyBUF_SIMPLE) < 0) {
            Py_XDECREF(it);
            goto fail;
        }
        dn[i] = str_to_counts((const char *)sb.buf, sb.len, &dc[i]);
        PyBuffer_Release(&sb);
        Py_DECREF(it);
        if (dn[i] < 0) {
            counts_error(dn[i]);
            dn[i] = 0;
            goto fail;
        }
        darea[i] = (double)rle_area_counts(dc[i], dn[i]);
    }
    for (j = 0; j < ng; j++) {
        PyObject *it = PySequence_GetItem(gts, j);
        PyObject *cr = PySequence_GetItem(crowd, j);
        Py_buffer sb;
        if (!it || !cr || PyObject_GetBuffer(it, &sb, PyBUF_SIMPLE) < 0) {
            Py_XDECREF(it);
            Py_XDECREF(cr);
            goto fail;
        }
        iscrowd[j] = (char)PyObject_IsTrue(cr);
        Py_DECREF(cr);
        gn[j] = str_to_counts((const char *)sb.buf, sb.len, &gc[j]);
        PyBuffer_Release(&sb);
        Py_DECREF(it);
        if (gn[j] < 0) {
            counts_error(gn[j]);
            gn[j] = 0;
            goto fail;
        }
        garea[j] = (double)rle_area_counts(gc[j], gn[j]);
    }

    out = PyList_New(nd * ng);
    if (!out)
        goto fail;
    for (i = 0; i < nd; i++) {
        for (j = 0; j < ng; j++) {
            double inter = inter_ones(dc[i], dn[i], gc[j], gn[j]);
            double denom = iscrowd[j] ? darea[i]
                                      : darea[i] + garea[j] - inter;
            double v = denom > 0.0 ? inter / denom : 0.0;
            PyList_SET_ITEM(out, i * ng + j, PyFloat_FromDouble(v));
        }
    }

fail:
    if (dc) {
        for (i = 0; i < nd; i++)
            free(dc[i]);
        free(dc);
    }
    if (gc) {
        for (j = 0; j < ng; j++)
            free(gc[j]);
        free(gc);
    }
    free(dn);
    free(gn);
    free(darea);
    free(garea);
    free(iscrowd);
    return out;
}

/* ------------------------------------------------------------ module */

static PyMethodDef MaskcMethods[] = {
    {"decode", maskc_decode, METH_VARARGS,
     "decode(s, h, w) -> column-major uint8 mask bytes"},
    {"encode", maskc_encode, METH_VARARGS,
     "encode(mask_colmajor_bytes, h, w) -> varint counts string"},
    {"area", maskc_area, METH_VARARGS, "area(s) -> int"},
    {"iou", maskc_iou, METH_VARARGS,
     "iou(det_strs, gt_strs, iscrowd) -> flat row-major list of IoU"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef maskcmodule = {
    PyModuleDef_HEAD_INIT, "_maskc",
    "Native COCO RLE codec + run-length-domain mask IoU", -1, MaskcMethods,
};

PyMODINIT_FUNC
PyInit__maskc(void)
{
    return PyModule_Create(&maskcmodule);
}
