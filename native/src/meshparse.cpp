// Native mesh parsers: Wavefront OBJ tokenizer/triangulator and binary STL.
//
// TPU-native counterpart of the reference's use of tinyobjloader
// (reference src/io.cpp:194-312 parses OBJ via tinyobj::LoadObj and streams
// triangles; src/io.cpp:395-435 parses binary STL).  The Python engine keeps
// all material/texture POLICY (reference io.cpp:276-303) -- this library only
// does the byte crunching: one pass over the file, custom float/int scanning,
// fan triangulation, 1-based/negative index resolution.  Exposed as a plain
// C ABI consumed from Python via ctypes; the numpy bulk parser remains the
// fallback when the shared library is not built.
//
// Build: part of native/CMakeLists.txt (libo2vmesh.so), or directly with
//   g++ -O2 -shared -fPIC -o build/libo2vmesh.so src/meshparse.cpp

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <string>

namespace {

struct Cursor {
    const char* p;
    const char* end;

    bool done() const { return p >= end; }

    void skip_ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    }
    void skip_line() {
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }
};

// Fast float scan: sign, digits, fraction, optional exponent.  Falls back to
// strtod only for exotic forms (inf/nan/hex).  Returns false if no number.
bool scan_float(Cursor& c, float* out) {
    c.skip_ws();
    const char* s = c.p;
    bool neg = false;
    if (s < c.end && (*s == '-' || *s == '+')) {
        neg = (*s == '-');
        ++s;
    }
    double mant = 0.0;
    int digits = 0;
    while (s < c.end && *s >= '0' && *s <= '9') {
        mant = mant * 10.0 + (*s - '0');
        ++s;
        ++digits;
    }
    int frac = 0;
    if (s < c.end && *s == '.') {
        ++s;
        while (s < c.end && *s >= '0' && *s <= '9') {
            mant = mant * 10.0 + (*s - '0');
            ++s;
            ++digits;
            ++frac;
        }
    }
    if (digits == 0) {
        // not a plain number (could be nan/inf); try strtod
        char* endp = nullptr;
        double v = strtod(c.p, &endp);
        if (endp == c.p) return false;
        c.p = endp;
        *out = (float)v;
        return true;
    }
    int exp = 0;
    if (s < c.end && (*s == 'e' || *s == 'E')) {
        const char* save = s;
        ++s;
        bool eneg = false;
        if (s < c.end && (*s == '-' || *s == '+')) {
            eneg = (*s == '-');
            ++s;
        }
        int ed = 0, ev = 0;
        while (s < c.end && *s >= '0' && *s <= '9') {
            ev = ev * 10 + (*s - '0');
            ++s;
            ++ed;
        }
        if (ed == 0) {
            s = save;  // bare 'e' belongs to the next token
        } else {
            exp = eneg ? -ev : ev;
        }
    }
    double v = mant * std::pow(10.0, exp - frac);
    *out = (float)(neg ? -v : v);
    c.p = s;
    return true;
}

bool scan_int(Cursor& c, long* out) {
    const char* s = c.p;
    bool neg = false;
    if (s < c.end && (*s == '-' || *s == '+')) {
        neg = (*s == '-');
        ++s;
    }
    long v = 0;
    int digits = 0;
    while (s < c.end && *s >= '0' && *s <= '9') {
        v = v * 10 + (*s - '0');
        ++s;
        ++digits;
    }
    if (!digits) return false;
    *out = neg ? -v : v;
    c.p = s;
    return true;
}

struct Corner {
    int v;
    int vt;
};

}  // namespace

extern "C" {

struct o2v_obj_mesh {
    float* positions;      // (n_positions, 3)
    long n_positions;
    float* texcoords;      // (n_texcoords, 2)
    long n_texcoords;
    int* tri_v;            // (n_tris, 3) resolved 0-based position indices
    int* tri_vt;           // (n_tris, 3) resolved texcoord indices, -1 = none
    int* tri_mat;          // (n_tris,) usemtl run index, -1 before any usemtl
    int* tri_face;         // (n_tris,) source face index (fan triangles share it)
    long n_tris;
    char* usemtl_names;    // '\n'-joined, one per run index
    long usemtl_len;
    char* mtllib_names;    // '\n'-joined
    long mtllib_len;
};

static char* dup_joined(const std::string& s, long* len) {
    *len = (long)s.size();
    char* out = (char*)malloc(s.size() + 1);
    if (out) memcpy(out, s.data(), s.size() + 1);
    return out;
}

// Parse an OBJ byte buffer.  Returns 0 on success, nonzero on hard errors
// (only allocation failure; malformed lines are skipped like tinyobj does).
int o2v_parse_obj(const char* data, long len, o2v_obj_mesh* out) {
    memset(out, 0, sizeof(*out));
    Cursor c{data, data + len};

    std::vector<float> pos, tc;
    std::vector<int> tv, tvt, tmat, tface;
    std::string usemtl, mtllib;
    int cur_mat = -1;
    int cur_face = 0;
    pos.reserve(1 << 12);
    tc.reserve(1 << 12);
    tv.reserve(1 << 13);

    std::vector<Corner> corners;
    corners.reserve(8);

    while (!c.done()) {
        c.skip_ws();
        if (c.done()) break;
        char k0 = *c.p;
        if (k0 == '\n') {
            ++c.p;
            continue;
        }
        char k1 = (c.p + 1 < c.end) ? c.p[1] : '\0';
        if (k0 == 'v' && (k1 == ' ' || k1 == '\t')) {
            c.p += 1;
            float x = 0, y = 0, z = 0;
            if (scan_float(c, &x) && scan_float(c, &y) && scan_float(c, &z)) {
                pos.push_back(x);
                pos.push_back(y);
                pos.push_back(z);
            }
            c.skip_line();
        } else if (k0 == 'v' && k1 == 't') {
            c.p += 2;
            float u = 0, v = 0;
            if (scan_float(c, &u)) {
                if (!scan_float(c, &v)) v = 0.0f;
                tc.push_back(u);
                tc.push_back(v);
            }
            c.skip_line();
        } else if (k0 == 'f' && (k1 == ' ' || k1 == '\t')) {
            c.p += 1;
            corners.clear();
            long np = (long)(pos.size() / 3);
            long nt = (long)(tc.size() / 2);
            for (;;) {
                c.skip_ws();
                long vi;
                if (!scan_int(c, &vi)) break;
                long ti = 0;  // 0 = absent (OBJ indices are 1-based)
                if (c.p < c.end && *c.p == '/') {
                    ++c.p;
                    if (!scan_int(c, &ti)) ti = 0;
                    if (c.p < c.end && *c.p == '/') {
                        ++c.p;
                        long ni;
                        scan_int(c, &ni);  // normals discarded
                    }
                }
                Corner corner;
                corner.v = (int)(vi > 0 ? vi - 1 : np + vi);
                corner.vt = (int)(ti > 0 ? ti - 1 : (ti < 0 ? nt + ti : -1));
                corners.push_back(corner);
            }
            // fan triangulation (0, i, i+1), tinyobj's default
            for (size_t i = 1; i + 1 < corners.size(); ++i) {
                tv.push_back(corners[0].v);
                tv.push_back(corners[i].v);
                tv.push_back(corners[i + 1].v);
                tvt.push_back(corners[0].vt);
                tvt.push_back(corners[i].vt);
                tvt.push_back(corners[i + 1].vt);
                tmat.push_back(cur_mat);
                tface.push_back(cur_face);
            }
            if (corners.size() >= 3) ++cur_face;
            c.skip_line();
        } else if (k0 == 'u' && !strncmp(c.p, "usemtl", 6)) {
            c.p += 6;
            c.skip_ws();
            const char* s = c.p;
            while (c.p < c.end && *c.p != '\n' && *c.p != '\r') ++c.p;
            const char* e = c.p;
            while (e > s && (e[-1] == ' ' || e[-1] == '\t')) --e;
            if (!usemtl.empty()) usemtl += '\n';
            usemtl.append(s, e);
            ++cur_mat;
            c.skip_line();
        } else if (k0 == 'm' && !strncmp(c.p, "mtllib", 6)) {
            c.p += 6;
            c.skip_ws();
            const char* s = c.p;
            while (c.p < c.end && *c.p != '\n' && *c.p != '\r') ++c.p;
            const char* e = c.p;
            while (e > s && (e[-1] == ' ' || e[-1] == '\t')) --e;
            if (!mtllib.empty()) mtllib += '\n';
            mtllib.append(s, e);
            c.skip_line();
        } else {
            c.skip_line();
        }
    }

    out->n_positions = (long)(pos.size() / 3);
    out->n_texcoords = (long)(tc.size() / 2);
    out->n_tris = (long)tmat.size();
    out->positions = (float*)malloc(pos.size() * sizeof(float) + 1);
    out->texcoords = (float*)malloc(tc.size() * sizeof(float) + 1);
    out->tri_v = (int*)malloc(tv.size() * sizeof(int) + 1);
    out->tri_vt = (int*)malloc(tvt.size() * sizeof(int) + 1);
    out->tri_mat = (int*)malloc(tmat.size() * sizeof(int) + 1);
    out->tri_face = (int*)malloc(tface.size() * sizeof(int) + 1);
    out->usemtl_names = dup_joined(usemtl, &out->usemtl_len);
    out->mtllib_names = dup_joined(mtllib, &out->mtllib_len);
    if (!out->positions || !out->texcoords || !out->tri_v || !out->tri_vt ||
        !out->tri_mat || !out->tri_face || !out->usemtl_names ||
        !out->mtllib_names) {
        return 1;
    }
    memcpy(out->positions, pos.data(), pos.size() * sizeof(float));
    memcpy(out->texcoords, tc.data(), tc.size() * sizeof(float));
    memcpy(out->tri_v, tv.data(), tv.size() * sizeof(int));
    memcpy(out->tri_vt, tvt.data(), tvt.size() * sizeof(int));
    memcpy(out->tri_mat, tmat.data(), tmat.size() * sizeof(int));
    memcpy(out->tri_face, tface.data(), tface.size() * sizeof(int));
    return 0;
}

void o2v_obj_free(o2v_obj_mesh* m) {
    free(m->positions);
    free(m->texcoords);
    free(m->tri_v);
    free(m->tri_vt);
    free(m->tri_mat);
    free(m->tri_face);
    free(m->usemtl_names);
    free(m->mtllib_names);
    memset(m, 0, sizeof(*m));
}

// Binary STL: 80-byte header + u32 count + count * 50-byte records
// (12 f32: normal + 3 verts, + u16 attribute).  Returns the number of
// triangles written to verts ((n, 3, 3) f32, caller-allocated), or -1 if the
// buffer is malformed / ASCII ("solid" prefix with inconsistent size,
// reference io.cpp:403-418 rejects ASCII STL).
long o2v_parse_stl(const char* data, long len, float* verts, long cap) {
    if (len < 84) return -1;
    uint32_t n;
    memcpy(&n, data + 80, 4);
    if ((long)n * 50 + 84 != len) return -1;
    long count = (long)n < cap ? (long)n : cap;
    for (long i = 0; i < count; ++i) {
        // skip the 12-byte normal (discarded, reference io.cpp:431)
        memcpy(verts + i * 9, data + 84 + i * 50 + 12, 36);
    }
    return count;
}

}  // extern "C"

extern "C" {

namespace {
inline char* put_uint(char* p, unsigned long v) {
    char buf[20];
    int n = 0;
    do {
        buf[n++] = (char)('0' + v % 10);
        v /= 10;
    } while (v);
    while (n) *p++ = buf[--n];
    return p;
}
inline char* put_int(char* p, long v) {
    if (v < 0) {
        *p++ = '-';
        return put_uint(p, (unsigned long)(-v));
    }
    return put_uint(p, (unsigned long)v);
}
}  // namespace

// ASCII "x y z r g b\n" lines (XYZRGB codec).  xyz: (n,3) int32, argb: (n,)
// uint32.  Returns bytes written, or -1 if cap may be too small.
long o2v_format_xyzrgb(const int* xyz, const unsigned* argb, long n,
                       char* out, long cap) {
    // true worst case per line: 3 coords x ("-2147483648" = 11 chars + sep)
    // + 3 color bytes x (3 chars + sep) = 48 bytes
    if (cap < n * 48) return -1;
    char* p = out;
    for (long i = 0; i < n; ++i) {
        p = put_int(p, xyz[i * 3 + 0]); *p++ = ' ';
        p = put_int(p, xyz[i * 3 + 1]); *p++ = ' ';
        p = put_int(p, xyz[i * 3 + 2]); *p++ = ' ';
        unsigned c = argb[i];
        p = put_uint(p, (c >> 16) & 0xFF); *p++ = ' ';
        p = put_uint(p, (c >> 8) & 0xFF); *p++ = ' ';
        p = put_uint(p, c & 0xFF); *p++ = '\n';
    }
    return (long)(p - out);
}

// ASCII "x y z i 127\n" voxel lines (QEF codec).
long o2v_format_qef(const int* xyz, const long* idx, long n,
                    char* out, long cap) {
    // true worst case per line: 3 coords x 12 + int64 idx ("-92233..." = 20
    // chars) + " 127\n" = 61 bytes
    if (cap < n * 61) return -1;
    char* p = out;
    for (long i = 0; i < n; ++i) {
        p = put_int(p, xyz[i * 3 + 0]); *p++ = ' ';
        p = put_int(p, xyz[i * 3 + 1]); *p++ = ' ';
        p = put_int(p, xyz[i * 3 + 2]); *p++ = ' ';
        p = put_int(p, idx[i]);
        *p++ = ' '; *p++ = '1'; *p++ = '2'; *p++ = '7'; *p++ = '\n';
    }
    return (long)(p - out);
}

}  // extern "C"
