// w3dnative — native host-side runtime components for the TPU engine.
//
// The reference implements its data-loading hot paths in C++ (hand-written
// .obj reader object_file_reader.cpp, fast float parsing fast_atof.h,
// binary model caches model3d.cpp).  This module provides the same class of
// native components for the TPU engine's host side:
//
//   parse_obj(bytes) -> (positions, normals, uvs, faces, face_norm_idx,
//                        face_uv_idx) as packed little-endian buffers
//
// Built with the CPython C API only (no pybind11 dependency); arrays are
// returned as bytes and wrapped with numpy.frombuffer on the Python side.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// fast float parse (fast_atof.h-class performance; handles the OBJ subset:
// [+-]digits[.digits][eE[+-]digits])
inline const char* parse_float(const char* p, const char* end, float& out) {
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    double val = 0.0;
    while (p < end && *p >= '0' && *p <= '9') { val = val * 10.0 + (*p - '0'); ++p; }
    if (p < end && *p == '.') {
        ++p;
        double frac = 0.0, scale = 1.0;
        while (p < end && *p >= '0' && *p <= '9') { frac = frac * 10.0 + (*p - '0'); scale *= 10.0; ++p; }
        val += frac / scale;
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        bool eneg = false;
        if (p < end && (*p == '-' || *p == '+')) { eneg = (*p == '-'); ++p; }
        int ex = 0;
        while (p < end && *p >= '0' && *p <= '9') { ex = ex * 10 + (*p - '0'); ++p; }
        double m = 1.0;
        while (ex-- > 0) m *= 10.0;
        val = eneg ? val / m : val * m;
    }
    out = static_cast<float>(neg ? -val : val);
    return p;
}

inline const char* parse_int(const char* p, const char* end, int& out) {
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    long v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; any = true; }
    out = any ? static_cast<int>(neg ? -v : v) : 0;
    return p;
}

struct ObjData {
    std::vector<float> pos;     // 3 per vertex
    std::vector<float> nrm;     // 3 per normal
    std::vector<float> uv;      // 2 per texcoord
    std::vector<int32_t> fv;    // 3 per triangle (vertex ids, 0-based)
    std::vector<int32_t> fn;    // 3 per triangle (normal ids, -1 if absent)
    std::vector<int32_t> ft;    // 3 per triangle (uv ids, -1 if absent)
};

// resolve OBJ 1-based / negative-relative indices to 0-based
inline int resolve_idx(int idx, size_t count) {
    if (idx > 0) return idx - 1;
    if (idx < 0) return static_cast<int>(count) + idx;
    return -1;
}

void parse_obj_impl(const char* buf, Py_ssize_t len, ObjData& out) {
    const char* p = buf;
    const char* end = buf + len;
    std::vector<int> vi, ni, ti;  // per-face scratch
    while (p < end) {
        // find line end
        const char* eol = static_cast<const char*>(memchr(p, '\n', end - p));
        if (!eol) eol = end;
        const char* q = p;
        while (q < eol && (*q == ' ' || *q == '\t')) ++q;
        if (q + 1 < eol && q[0] == 'v' && (q[1] == ' ' || q[1] == '\t')) {
            float x, y, z;
            q = parse_float(q + 2, eol, x);
            q = parse_float(q, eol, y);
            q = parse_float(q, eol, z);
            out.pos.push_back(x); out.pos.push_back(y); out.pos.push_back(z);
        } else if (q + 2 < eol && q[0] == 'v' && q[1] == 'n') {
            float x, y, z;
            q = parse_float(q + 3, eol, x);
            q = parse_float(q, eol, y);
            q = parse_float(q, eol, z);
            out.nrm.push_back(x); out.nrm.push_back(y); out.nrm.push_back(z);
        } else if (q + 2 < eol && q[0] == 'v' && q[1] == 't') {
            float u, v;
            q = parse_float(q + 3, eol, u);
            q = parse_float(q, eol, v);
            out.uv.push_back(u); out.uv.push_back(v);
        } else if (q + 1 < eol && q[0] == 'f' && (q[1] == ' ' || q[1] == '\t')) {
            vi.clear(); ni.clear(); ti.clear();
            const char* r = q + 2;
            while (r < eol) {
                while (r < eol && (*r == ' ' || *r == '\t')) ++r;
                if (r >= eol) break;
                int a = 0, b = 0, c = 0;
                r = parse_int(r, eol, a);
                if (r < eol && *r == '/') {
                    ++r;
                    if (r < eol && *r != '/') r = parse_int(r, eol, b);
                    if (r < eol && *r == '/') { ++r; r = parse_int(r, eol, c); }
                }
                vi.push_back(resolve_idx(a, out.pos.size() / 3));
                ti.push_back(b ? resolve_idx(b, out.uv.size() / 2) : -1);
                ni.push_back(c ? resolve_idx(c, out.nrm.size() / 3) : -1);
            }
            // fan-triangulate polygons (object_file_reader does the same)
            for (size_t k = 2; k < vi.size(); ++k) {
                out.fv.push_back(vi[0]); out.fv.push_back(vi[k - 1]); out.fv.push_back(vi[k]);
                out.fn.push_back(ni[0]); out.fn.push_back(ni[k - 1]); out.fn.push_back(ni[k]);
                out.ft.push_back(ti[0]); out.ft.push_back(ti[k - 1]); out.ft.push_back(ti[k]);
            }
        }
        p = eol + 1;
    }
}

template <typename T>
PyObject* to_bytes(const std::vector<T>& v) {
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(v.data()),
        static_cast<Py_ssize_t>(v.size() * sizeof(T)));
}

PyObject* py_parse_obj(PyObject*, PyObject* args) {
    const char* buf;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "y#", &buf, &len)) return nullptr;
    ObjData d;
    Py_BEGIN_ALLOW_THREADS
    parse_obj_impl(buf, len, d);
    Py_END_ALLOW_THREADS
    PyObject* t = PyTuple_New(6);
    PyTuple_SET_ITEM(t, 0, to_bytes(d.pos));
    PyTuple_SET_ITEM(t, 1, to_bytes(d.nrm));
    PyTuple_SET_ITEM(t, 2, to_bytes(d.uv));
    PyTuple_SET_ITEM(t, 3, to_bytes(d.fv));
    PyTuple_SET_ITEM(t, 4, to_bytes(d.fn));
    PyTuple_SET_ITEM(t, 5, to_bytes(d.ft));
    return t;
}

// ---------------------------------------------------------------------------
// Tipsify vertex-cache triangle reordering — the native twin of
// scene/mesh_opt.py::tipsify (the reference runs this class of mesh
// optimization in C++: triListOpt.cpp / vertex_opt full_opt path).
// Mirrors the Python algorithm EXACTLY (same tie-breaking, same dead-end
// stack order) so both produce identical index streams.
// ---------------------------------------------------------------------------

PyObject* py_tipsify(PyObject*, PyObject* args) {
    Py_buffer buf;
    long num_verts_l, cache_size_l;
    if (!PyArg_ParseTuple(args, "y*ll", &buf, &num_verts_l, &cache_size_l))
        return nullptr;
    const int64_t nidx = (int64_t)(buf.len / sizeof(int32_t));
    const int32_t* idx = (const int32_t*)buf.buf;
    const int64_t F = nidx / 3;
    const int64_t V = num_verts_l;
    const int64_t C = cache_size_l;
    std::vector<int32_t> out;
    out.reserve(nidx);

    // CSR adjacency: corners grouped by vertex in corner order (matches
    // np.argsort(..., kind="stable") on the raveled corner list)
    std::vector<int64_t> counts(V + 1, 0);
    for (int64_t i = 0; i < nidx; ++i) ++counts[idx[i] + 1];
    std::vector<int64_t> offs(V + 1, 0);
    for (int64_t v = 0; v < V; ++v) offs[v + 1] = offs[v] + counts[v + 1];
    std::vector<int64_t> adj(nidx);
    {
        std::vector<int64_t> cur(offs.begin(), offs.end() - 1);
        for (int64_t i = 0; i < nidx; ++i) adj[cur[idx[i]]++] = i / 3;
    }
    std::vector<int64_t> live(V);
    for (int64_t v = 0; v < V; ++v) live[v] = offs[v + 1] - offs[v];
    std::vector<uint8_t> emitted(F, 0);
    std::vector<int64_t> cache_time(V, -(int64_t)1000000000);
    int64_t time = C + 1;
    std::vector<int64_t> dead_end;
    dead_end.reserve(nidx);
    int64_t fanning = 0, cursor = 0, n_out = 0;
    bool have_fan = false;

    auto next_fan_from = [&](int64_t v) -> int64_t {
        int64_t best = -1, best_pri = -1;
        for (int64_t s = offs[v]; s < offs[v + 1]; ++s) {
            const int64_t t = adj[s];
            if (emitted[t]) continue;
            for (int k = 0; k < 3; ++k) {
                const int64_t u = idx[3 * t + k];
                int64_t pri = 0;
                if (time - cache_time[u] + 2 * live[u] <= C)
                    pri = time - cache_time[u];
                if (live[u] > 0 && pri > best_pri) { best = u; best_pri = pri; }
            }
        }
        return best;
    };

    while (n_out < F) {
        if (!have_fan) {
            fanning = -1;
            while (!dead_end.empty()) {
                const int64_t v = dead_end.back();
                dead_end.pop_back();
                if (live[v] > 0) { fanning = v; break; }
            }
            if (fanning < 0) {
                while (cursor < V && live[cursor] == 0) ++cursor;
                fanning = (cursor < V) ? cursor : -1;
            }
            if (fanning < 0) break;
            have_fan = true;
        }
        bool any_emitted = false;
        for (int64_t s = offs[fanning]; s < offs[fanning + 1]; ++s) {
            const int64_t t = adj[s];
            if (emitted[t]) continue;
            emitted[t] = 1;
            for (int k = 0; k < 3; ++k) out.push_back(idx[3 * t + k]);
            ++n_out;
            any_emitted = true;
            for (int k = 0; k < 3; ++k) {
                const int64_t u = idx[3 * t + k];
                --live[u];
                dead_end.push_back(u);
                if (time - cache_time[u] > C) { cache_time[u] = time; ++time; }
            }
        }
        const int64_t nxt = next_fan_from(fanning);
        if (nxt < 0 || !any_emitted) {
            have_fan = false;
        } else {
            fanning = nxt;
            have_fan = live[fanning] > 0;
        }
    }
    if (n_out < F) {   // disconnected leftovers in input order
        for (int64_t t = 0; t < F; ++t) {
            if (emitted[t]) continue;
            for (int k = 0; k < 3; ++k) out.push_back(idx[3 * t + k]);
            ++n_out;
        }
    }
    PyBuffer_Release(&buf);
    return PyBytes_FromStringAndSize((const char*)out.data(),
                                     (Py_ssize_t)(out.size() * sizeof(int32_t)));
}

PyMethodDef methods[] = {
    {"parse_obj", py_parse_obj, METH_VARARGS,
     "parse_obj(data: bytes) -> (pos, nrm, uv, fv, fn, ft) packed buffers"},
    {"tipsify", py_tipsify, METH_VARARGS,
     "tipsify(int32 indices bytes, num_verts, cache_size) -> reordered "
     "int32 indices bytes (vertex-cache triangle optimization)"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "w3dnative",
    "Native host-side runtime components (fast OBJ parsing).",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_w3dnative(void) { return PyModule_Create(&moduledef); }
