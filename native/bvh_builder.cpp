// Native BVH builder: median-split over triangle centroids.
//
// TPU-native framework's equivalent of the reference's C++ kd-tree
// construction (reference: mitsuba/include/mitsuba/render/gkdtree.h — the
// SAH builder runs natively there too). Tree *traversal* happens on-device
// (sdmm_tpu/render/bvh.py); this library accelerates host-side build for
// multi-million-triangle scenes where the numpy builder is too slow.
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image).
//
// Layout contract (must match render/bvh.py build_bvh):
//  - depth-first node order; internal hit-link = node + 1
//  - miss[] = escape pointer; leaf_start >= 0 marks leaves
//  - perm[] = triangle order, leaves padded to leaf_size with -1

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BuildItem {
  int32_t begin, end;   // range into the index array
  int32_t node = -1;    // -1: build; >=0: finalize subtree end for `node`
};

}  // namespace

extern "C" {

// Returns 0 on success. Caller allocates:
//   node_lo/node_hi: [max_nodes*3], leaf_start/leaf_count/miss: [max_nodes]
//   perm: [n_tris + max_nodes*leaf_size] (worst-case padding)
// where max_nodes = 2 * ceil(n_tris/1) is always safe (2*n_tris).
int bvh_build(const float* verts,  // [n_tris, 3, 3]
              int32_t n_tris, int32_t leaf_size,
              float* node_lo, float* node_hi,
              int32_t* leaf_start, int32_t* leaf_count, int32_t* miss,
              int32_t* perm,
              int32_t* n_nodes_out, int32_t* n_perm_out) {
  if (n_tris <= 0) return 1;
  std::vector<float> tlo(3 * n_tris), thi(3 * n_tris), cen(3 * n_tris);
  for (int32_t i = 0; i < n_tris; ++i) {
    for (int k = 0; k < 3; ++k) {
      float a = verts[i * 9 + 0 + k];
      float b = verts[i * 9 + 3 + k];
      float c = verts[i * 9 + 6 + k];
      float lo = std::min(a, std::min(b, c));
      float hi = std::max(a, std::max(b, c));
      tlo[i * 3 + k] = lo;
      thi[i * 3 + k] = hi;
      cen[i * 3 + k] = (a + b + c) * (1.0f / 3.0f);
    }
  }
  std::vector<int32_t> idx(n_tris);
  for (int32_t i = 0; i < n_tris; ++i) idx[i] = i;

  int32_t n_nodes = 0, n_perm = 0;
  std::vector<int32_t> end_of(2 * n_tris + 2, -1);
  std::vector<BuildItem> stack;
  stack.push_back({0, n_tris, -1});

  while (!stack.empty()) {
    BuildItem it = stack.back();
    stack.pop_back();
    if (it.node >= 0) {  // finalize marker
      end_of[it.node] = n_nodes;
      continue;
    }
    int32_t node = n_nodes++;
    float lo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float hi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int32_t j = it.begin; j < it.end; ++j) {
      int32_t t = idx[j];
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::min(lo[k], tlo[t * 3 + k]);
        hi[k] = std::max(hi[k], thi[t * 3 + k]);
      }
    }
    std::memcpy(node_lo + node * 3, lo, 12);
    std::memcpy(node_hi + node * 3, hi, 12);
    miss[node] = -1;  // filled by the link pass
    int32_t count = it.end - it.begin;
    if (count <= leaf_size) {
      leaf_start[node] = n_perm;
      leaf_count[node] = count;
      for (int32_t j = it.begin; j < it.end; ++j) perm[n_perm++] = idx[j];
      while (n_perm % leaf_size) perm[n_perm++] = -1;
      end_of[node] = node + 1;
      continue;
    }
    leaf_start[node] = -1;
    leaf_count[node] = 0;
    int axis = 0;
    float ext0 = hi[0] - lo[0], ext1 = hi[1] - lo[1], ext2 = hi[2] - lo[2];
    if (ext1 > ext0 && ext1 >= ext2) axis = 1;
    else if (ext2 > ext0 && ext2 > ext1) axis = 2;
    int32_t mid = it.begin + count / 2;
    std::nth_element(
        idx.begin() + it.begin, idx.begin() + mid, idx.begin() + it.end,
        [&](int32_t a, int32_t b) {
          return cen[a * 3 + axis] < cen[b * 3 + axis];
        });
    // Depth-first order: finalize marker, right, left (LIFO).
    stack.push_back({0, 0, node});
    stack.push_back({mid, it.end, -1});
    stack.push_back({it.begin, mid, -1});
  }

  // Miss links (escape pointers) via explicit stack.
  {
    std::vector<std::pair<int32_t, int32_t>> st;
    st.emplace_back(0, -1);
    while (!st.empty()) {
      auto [node, escape] = st.back();
      st.pop_back();
      miss[node] = escape;
      if (leaf_start[node] < 0) {
        int32_t left = node + 1;
        int32_t right = end_of[left];
        st.emplace_back(left, right);
        st.emplace_back(right, escape);
      }
    }
  }

  *n_nodes_out = n_nodes;
  *n_perm_out = n_perm;
  return 0;
}

}  // extern "C"
