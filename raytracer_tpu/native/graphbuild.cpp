// Native graph-construction kernels for the host mesh builder.
//
// The Python/scipy formulation of the node adjacency (incidence-matrix
// triple product, models/annulus.py:node_adjacency) performs ~100M
// duplicate-summing multiply-adds; this direct sorted-union merge does
// the same job in ~2 orders of magnitude less work.  Exposed via ctypes
// (see native/__init__.py); the scipy path remains as a fallback and as
// the reference implementation for tests.
//
// Build:  g++ -O3 -march=native -shared -fPIC graphbuild.cpp -o libgraphbuild.so

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Node adjacency of the element-incidence relaxation graph.
//
// Inputs (all int64):
//   e2n_flat / e2n_off   : ragged element -> node lists (nel+1 offsets)
//   nbr_flat / nbr_off   : ragged element -> neighbour-element lists
//   nel, nnods           : counts
//   star                 : 0 = own elements only, s >= 1 = + all elements
//                          within s hops of the element-neighbour graph
//                          (matching the scipy reference's boolean
//                          (I + N)^s expansion, add_star_levels! analogue)
// Two-phase API to let the caller allocate exact output buffers:
//   phase 1 (indices == nullptr): fills indptr (size nnods+1), returns nnz
//   phase 2 (indices != nullptr): fills indices (sorted per row)
int64_t node_adjacency(
    const int64_t* e2n_flat, const int64_t* e2n_off,
    const int64_t* nbr_flat, const int64_t* nbr_off,
    int64_t nel, int64_t nnods, int64_t star,
    int64_t* indptr, int64_t* indices)
{
    // invert e2n: node -> elements (counting sort)
    std::vector<int64_t> ecnt(nnods + 1, 0);
    for (int64_t e = 0; e < nel; ++e)
        for (int64_t k = e2n_off[e]; k < e2n_off[e + 1]; ++k)
            ++ecnt[e2n_flat[k] + 1];
    std::vector<int64_t> eoff(nnods + 1);
    eoff[0] = 0;
    for (int64_t n = 0; n < nnods; ++n) eoff[n + 1] = eoff[n] + ecnt[n + 1];
    std::vector<int64_t> n2e(eoff[nnods]);
    {
        std::vector<int64_t> cur(eoff.begin(), eoff.end() - 1);
        for (int64_t e = 0; e < nel; ++e)
            for (int64_t k = e2n_off[e]; k < e2n_off[e + 1]; ++k)
                n2e[cur[e2n_flat[k]]++] = e;
    }

    // per-element patch: sorted unique nodes of every element within
    // `star` hops of e in the element-neighbour graph (BFS with a stamp
    // array; star=0 -> just e, star=1 -> e + its neighbours, ...)
    std::vector<int64_t> patch_off(nel + 1, 0);
    std::vector<int64_t> patch_flat;
    {
        std::vector<int64_t> tmp;
        std::vector<int64_t> stamp(nel, -1);
        std::vector<int64_t> frontier, next, members;
        patch_flat.reserve(e2n_off[nel] * (star ? 6 : 1));
        for (int64_t e = 0; e < nel; ++e) {
            members.clear();
            members.push_back(e);
            stamp[e] = e;
            frontier.assign(1, e);
            for (int64_t depth = 0; depth < star; ++depth) {
                next.clear();
                for (int64_t f : frontier) {
                    for (int64_t k = nbr_off[f]; k < nbr_off[f + 1]; ++k) {
                        int64_t ne = nbr_flat[k];
                        if (stamp[ne] != e) {
                            stamp[ne] = e;
                            members.push_back(ne);
                            next.push_back(ne);
                        }
                    }
                }
                frontier.swap(next);
            }
            tmp.clear();
            for (int64_t m : members)
                tmp.insert(tmp.end(), e2n_flat + e2n_off[m], e2n_flat + e2n_off[m + 1]);
            std::sort(tmp.begin(), tmp.end());
            tmp.erase(std::unique(tmp.begin(), tmp.end()), tmp.end());
            patch_flat.insert(patch_flat.end(), tmp.begin(), tmp.end());
            patch_off[e + 1] = (int64_t)patch_flat.size();
        }
    }

    // per node: union of the patches of its elements, self excluded
    std::vector<int64_t> row;
    int64_t nnz = 0;
    for (int64_t n = 0; n < nnods; ++n) {
        row.clear();
        for (int64_t k = eoff[n]; k < eoff[n + 1]; ++k) {
            int64_t e = n2e[k];
            row.insert(row.end(), patch_flat.begin() + patch_off[e],
                       patch_flat.begin() + patch_off[e + 1]);
        }
        std::sort(row.begin(), row.end());
        row.erase(std::unique(row.begin(), row.end()), row.end());
        // drop self
        auto it = std::lower_bound(row.begin(), row.end(), n);
        if (it != row.end() && *it == n) row.erase(it);

        if (indices) {
            std::copy(row.begin(), row.end(), indices + indptr[n]);
        } else {
            indptr[n + 1] = indptr[n] + (int64_t)row.size();
        }
        nnz += (int64_t)row.size();
    }
    return nnz;
}

}  // extern "C"
