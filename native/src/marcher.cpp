// Native scalar reference marcher over the packed device-world layout.
//
// The C++ twin of the Python oracle (octree_raymarcher_tpu/march/cpu_ref.py)
// and the XLA lockstep marcher (ops/march_jnp.py): one bounded loop per ray
// that locates the chunk (toroidal), descends the octree to the cell at the
// ray point, terminates on solid LEAF cells / twig texels and otherwise
// advances past the cell/texel by its slab escape distance.  Same float32
// arithmetic and the same EPS/BIGEPS constants, so results can be asserted
// against both JAX implementations (capability parity with the reference's
// CPU pick marcher, src/Traverse.cpp:115-171, re-expressed over our pools).
//
// Build: native/Makefile -> liboctnative.so; Python bindings via ctypes in
// octree_raymarcher_tpu/utils/native.py.

#include <cmath>
#include <cstdint>

namespace {

constexpr float kEps = 1.0f / 4096.0f;     // core/constants.py EPS
constexpr float kBigEps = 1.0f / 16.0f;    // core/constants.py BIGEPS
constexpr int kTwigSize = 4;
constexpr int kTwigWords = 64;

constexpr uint32_t kEmpty = 0, kLeaf = 1, kBranch = 2, kTwig = 3;

inline float safe_inv(float d) {
    const float tiny = 1e-30f;
    if (std::fabs(d) < tiny) d = d < 0 ? -tiny : tiny;
    return 1.0f / d;
}

inline int imod(int a, int m) {
    int r = a % m;
    return r < 0 ? r + m : r;
}

struct WorldView {
    const uint32_t *tree;
    const uint32_t *twig;       // flat texels, 1 material per u32
    const float *chunk_bmin;    // [V, 3]
    const int32_t *chunk_tree;  // [V]
    const int32_t *chunk_twig;  // [V] (twig-index offset)
    float ccmin[3];
    float chunksize;
    int w, h, d, depth;
};

}  // namespace

extern "C" {

// March n rays.  Outputs are caller-allocated arrays of length n (cell_bmin:
// 3n).  Returns 0.
int march_rays(
    const uint32_t *tree, const uint32_t *twig,
    const float *chunk_bmin, const int32_t *chunk_tree,
    const int32_t *chunk_twig, const float *chunkcoordmin,
    float chunksize, int w, int h, int d, int depth,
    const float *origins, const float *dirs, int64_t n, int max_steps,
    uint8_t *out_hit, float *out_t, int32_t *out_mat,
    float *out_cell_bmin, float *out_cell_size, int32_t *out_steps) {
    WorldView W{tree, twig, chunk_bmin, chunk_tree, chunk_twig,
                {chunkcoordmin[0], chunkcoordmin[1], chunkcoordmin[2]},
                chunksize, w, h, d, depth};
    const float cs = W.chunksize;
    const float lo[3] = {W.ccmin[0] * cs, W.ccmin[1] * cs, W.ccmin[2] * cs};
    const float hi[3] = {lo[0] + w * cs, lo[1] + h * cs, lo[2] + d * cs};

#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n; ++r) {
        const float a[3] = {origins[3 * r], origins[3 * r + 1], origins[3 * r + 2]};
        const float b[3] = {dirs[3 * r], dirs[3 * r + 1], dirs[3 * r + 2]};
        const float g[3] = {safe_inv(b[0]), safe_inv(b[1]), safe_inv(b[2])};

        out_hit[r] = 0;
        out_mat[r] = 0;
        out_cell_bmin[3 * r] = out_cell_bmin[3 * r + 1] = out_cell_bmin[3 * r + 2] = 0;
        out_cell_size[r] = 0;
        int steps = 0;

        // Entry: advance to the world box if outside.
        float t = 0.0f;
        bool inside = a[0] >= lo[0] && a[0] <= hi[0] && a[1] >= lo[1] &&
                      a[1] <= hi[1] && a[2] >= lo[2] && a[2] <= hi[2];
        if (!inside) {
            float tn = -INFINITY, tf = INFINITY;
            for (int k = 0; k < 3; ++k) {
                float t1 = (lo[k] - a[k]) * g[k];
                float t2 = (hi[k] - a[k]) * g[k];
                if (t1 > t2) { float s = t1; t1 = t2; t2 = s; }
                if (t1 > tn) tn = t1;
                if (t2 < tf) tf = t2;
            }
            if (!(tf > tn && tn > 0)) { out_t[r] = INFINITY; out_steps[r] = 0; continue; }
            t = tn + kEps;
        }

        bool hit = false;
        for (int it = 0; it < max_steps; ++it) {
            const float p[3] = {a[0] + b[0] * t, a[1] + b[1] * t, a[2] + b[2] * t};
            if (p[0] < lo[0] || p[0] > hi[0] || p[1] < lo[1] || p[1] > hi[1] ||
                p[2] < lo[2] || p[2] > hi[2])
                break;
            ++steps;

            // Toroidal chunk lookup (Chunkmarch.glsl:156-167 analog).
            const float q[3] = {std::floor(p[0] / cs), std::floor(p[1] / cs),
                                std::floor(p[2] / cs)};
            int ci = imod((int)q[0], W.w) + imod((int)q[2], W.d) * W.w +
                     imod((int)q[1], W.h) * (W.w * W.d);
            if (W.chunk_bmin[3 * ci] != q[0] * cs ||
                W.chunk_bmin[3 * ci + 1] != q[1] * cs ||
                W.chunk_bmin[3 * ci + 2] != q[2] * cs)
                break;  // chunk not resident (mid-stream)
            const int32_t toff = W.chunk_tree[ci];
            const int32_t woff = W.chunk_twig[ci];

            // Descend to the cell containing p.
            float bm[3] = {q[0] * cs, q[1] * cs, q[2] * cs};
            float size = cs;
            uint32_t word = W.tree[toff];
            for (int lv = 0; lv < W.depth; ++lv) {
                if ((word >> 30) != kBranch) break;
                const int32_t payload = (int32_t)(word & 0x3FFFFFFFu);
                const float half = size * 0.5f;
                int child = payload;
                for (int k = 0; k < 3; ++k) {
                    if (p[k] >= bm[k] + half) {
                        child += 1 << k;  // x + 2y + 4z
                        bm[k] += half;
                    }
                }
                size = half;
                word = W.tree[toff + child];
            }
            const uint32_t ty = word >> 30;
            const int32_t payload = (int32_t)(word & 0x3FFFFFFFu);

            float ebm[3] = {bm[0], bm[1], bm[2]};
            float esize = size;
            int32_t mat = -1;
            if (ty == kLeaf) {
                mat = payload;
            } else if (ty == kTwig) {
                const float leaf = size / kTwigSize;
                int tx[3];
                for (int k = 0; k < 3; ++k) {
                    int i = (int)((p[k] - bm[k]) / leaf);
                    tx[k] = i < 0 ? 0 : (i >= kTwigSize ? kTwigSize - 1 : i);
                    ebm[k] = bm[k] + tx[k] * leaf;
                }
                esize = leaf;
                const int tword = tx[2] * 16 + tx[1] * 4 + tx[0];
                const uint32_t texel =
                    W.twig[(int64_t)(woff + payload) * kTwigWords + tword];
                if (texel != 0) mat = (int32_t)texel;
            }
            if (mat >= 0 && ty != kEmpty) {
                out_hit[r] = 1;
                out_t[r] = t;
                out_mat[r] = mat;
                out_cell_bmin[3 * r] = ebm[0];
                out_cell_bmin[3 * r + 1] = ebm[1];
                out_cell_bmin[3 * r + 2] = ebm[2];
                out_cell_size[r] = esize;
                hit = true;
                break;
            }

            // Escape the (cell | texel) slab.
            float esc = INFINITY;
            for (int k = 0; k < 3; ++k) {
                float d1 = (ebm[k] - p[k]) * g[k];
                float d2 = (ebm[k] + esize - p[k]) * g[k];
                float dk = d1 > d2 ? d1 : d2;
                if (dk < esc) esc = dk;
            }
            if (esc < kEps) esc = kBigEps;
            t += esc + kEps;
        }
        if (!hit) out_t[r] = INFINITY;
        out_steps[r] = steps;
    }
    return 0;
}

}  // extern "C"
