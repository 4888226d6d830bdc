// Native mesh-runtime kernels (host side).
//
// Scope of reference host-side mesh machinery:
//  - src/Numerics/Mesh/BrickMesh.jl:40  hilbertcode (space-filling-curve
//    codes used to order/partition elements)
//  - src/Numerics/Mesh/Topologies.jl connectmesh-style face matching
//    (vertex-set hashing; orientation codes per matched face pair)
//
// The reference is 100% Julia (JIT-native); this framework keeps the
// compute path in XLA and moves the O(E) host-side mesh construction to
// C++ — face matching is hashing-bound and dominates setup for
// production-scale meshes (millions of elements).
//
// Built as a plain C ABI shared object (ctypes binding, no pybind11).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct FaceKey {
  int64_t v[4];
  bool operator==(const FaceKey& o) const {
    return v[0] == o.v[0] && v[1] == o.v[1] && v[2] == o.v[2] &&
           v[3] == o.v[3];
  }
};

struct FaceKeyHash {
  size_t operator()(const FaceKey& k) const {
    uint64_t h = 1469598103934665603ull;  // FNV-1a over the 4 ids
    for (int i = 0; i < 4; ++i) {
      uint64_t x = static_cast<uint64_t>(k.v[i]);
      for (int b = 0; b < 8; ++b) {
        h ^= (x >> (8 * b)) & 0xff;
        h *= 1099511628211ull;
      }
    }
    return static_cast<size_t>(h);
  }
};

// face->corner tables (tangential order; must match mesh/topology.py)
const int kFace3D[6][4] = {{0, 2, 4, 6}, {1, 3, 5, 7}, {0, 1, 4, 5},
                           {2, 3, 6, 7}, {0, 1, 2, 3}, {4, 5, 6, 7}};
const int kFace2D[4][2] = {{0, 2}, {1, 3}, {0, 1}, {2, 3}};

inline void sort4(int64_t* a, int n) {
  for (int i = 1; i < n; ++i) {
    int64_t key = a[i];
    int j = i - 1;
    while (j >= 0 && a[j] > key) {
      a[j + 1] = a[j];
      --j;
    }
    a[j + 1] = key;
  }
}

// orientation code for quad faces: bit0 flip-a, bit1 flip-b, bit2 swap
// (must match topology._orient_code_quad)
int orient_quad(const int64_t* mine, const int64_t* nb) {
  for (int code = 0; code < 8; ++code) {
    bool ok = true;
    for (int tb = 0; tb < 2 && ok; ++tb)
      for (int ta = 0; ta < 2 && ok; ++ta) {
        int u = (code & 4) ? tb : ta;
        int v = (code & 4) ? ta : tb;
        int ap = (code & 1) ? 1 - u : u;
        int bp = (code & 2) ? 1 - v : v;
        if (mine[ta + 2 * tb] != nb[ap + 2 * bp]) ok = false;
      }
    if (ok) return code;
  }
  return -1;
}

int orient_edge(const int64_t* mine, const int64_t* nb) {
  if (mine[0] == nb[0] && mine[1] == nb[1]) return 0;
  if (mine[0] == nb[1] && mine[1] == nb[0]) return 1;
  return -1;
}

}  // namespace

extern "C" {

// Face connectivity from an element->vertex table.
//   dim: 2 or 3; e2v: [nelem, 2^dim] vertex ids;
//   default_bctags: [nelem, 2*dim] or nullptr (tag 1).
// Outputs (preallocated by caller): neighbor/neighbor_face [nelem, 2*dim]
// int64, orient/bctag int32.  Returns 0 on success, <0 on error.
int cm_connect_faces(int dim, int64_t nelem, const int64_t* e2v,
                     const int32_t* default_bctags, int64_t* neighbor,
                     int64_t* neighbor_face, int32_t* orient,
                     int32_t* bctag) {
  if (dim != 2 && dim != 3) return -1;
  const int nface = 2 * dim;
  const int ncorner = (dim == 3) ? 4 : 2;
  const int nvert = 1 << dim;

  // corner ids per (e, f) in tangential order
  std::vector<int64_t> corners(static_cast<size_t>(nelem) * nface * 4, -1);
  std::unordered_map<FaceKey, std::pair<int64_t, int32_t>, FaceKeyHash> seen;
  seen.reserve(static_cast<size_t>(nelem) * nface / 2 + 16);

  for (int64_t e = 0; e < nelem; ++e) {
    for (int f = 0; f < nface; ++f) {
      int64_t* c = &corners[(static_cast<size_t>(e) * nface + f) * 4];
      for (int k = 0; k < ncorner; ++k) {
        int corner = (dim == 3) ? kFace3D[f][k] : kFace2D[f][k];
        c[k] = e2v[e * nvert + corner];
      }
      neighbor[e * nface + f] = e;
      neighbor_face[e * nface + f] = f;
      orient[e * nface + f] = 0;
      bctag[e * nface + f] = 0;
    }
  }

  for (int64_t e = 0; e < nelem; ++e) {
    for (int f = 0; f < nface; ++f) {
      FaceKey key;
      const int64_t* c = &corners[(static_cast<size_t>(e) * nface + f) * 4];
      key.v[0] = c[0];
      key.v[1] = c[1];
      key.v[2] = c[2];
      key.v[3] = c[3];
      sort4(key.v, 4);  // -1 padding sorts first; harmless

      auto it = seen.find(key);
      if (it == seen.end()) {
        seen.emplace(key, std::make_pair(e, f));
      } else {
        int64_t e1 = it->second.first;
        int32_t f1 = it->second.second;
        if (neighbor[e1 * nface + f1] != e1) return -2;  // >2 share a face
        neighbor[e * nface + f] = e1;
        neighbor_face[e * nface + f] = f1;
        neighbor[e1 * nface + f1] = e;
        neighbor_face[e1 * nface + f1] = f;
        const int64_t* c1 =
            &corners[(static_cast<size_t>(e1) * nface + f1) * 4];
        int o0, o1;
        if (dim == 3) {
          o0 = orient_quad(c, c1);
          o1 = orient_quad(c1, c);
        } else {
          o0 = orient_edge(c, c1);
          o1 = o0;
        }
        if (o0 < 0 || o1 < 0) return -3;
        orient[e * nface + f] = o0;
        orient[e1 * nface + f1] = o1;
        seen.erase(it);
      }
    }
  }

  // leftovers in `seen` are boundary faces
  for (const auto& kv : seen) {
    int64_t e = kv.second.first;
    int32_t f = kv.second.second;
    bctag[e * nface + f] =
        default_bctags ? default_bctags[e * nface + f] : 1;
  }
  return 0;
}

// 3-D Hilbert curve index (Skilling's public-domain TransposetoAxes
// inverse), matching the role of reference BrickMesh.jl:40 hilbertcode:
// map quantized element centroids to 1-D codes whose ordering gives a
// locality-preserving element order for partitioning.
//   n points; nbits per axis (<= 21); xyz: [n, 3] uint32; codes: [n].
void cm_hilbert_codes(int64_t n, int nbits, const uint32_t* xyz,
                      uint64_t* codes) {
  for (int64_t i = 0; i < n; ++i) {
    uint32_t X[3] = {xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2]};
    // Skilling: AxestoTranspose
    uint32_t M = 1u << (nbits - 1), P, Q, t;
    for (Q = M; Q > 1; Q >>= 1) {
      P = Q - 1;
      for (int j = 0; j < 3; ++j) {
        if (X[j] & Q) {
          X[0] ^= P;  // invert
        } else {      // exchange
          t = (X[0] ^ X[j]) & P;
          X[0] ^= t;
          X[j] ^= t;
        }
      }
    }
    for (int j = 1; j < 3; ++j) X[j] ^= X[j - 1];
    t = 0;
    for (Q = M; Q > 1; Q >>= 1)
      if (X[2] & Q) t ^= Q - 1;
    for (int j = 0; j < 3; ++j) X[j] ^= t;
    // interleave transposed bits into one code (x2 fastest)
    uint64_t code = 0;
    for (int b = nbits - 1; b >= 0; --b)
      for (int j = 0; j < 3; ++j)
        code = (code << 1) | ((X[j] >> b) & 1u);
    codes[i] = code;
  }
}

}  // extern "C"
