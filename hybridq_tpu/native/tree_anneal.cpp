// tree_anneal — simulated annealing over contraction trees (C++17).
//
// Local-rotation annealing on the binary contraction tree, the
// restructuring engine that closes the gap between partition-based
// candidate trees and state-of-the-art paths on circuit-shaped tensor
// networks (cf. cotengra's `simulated_anneal`; the reference reaches
// comparable quality through cotengra's Bayesian hyper-optimization,
// hybridq/circuit/simulation/simulation.py:920-983).
//
// Tree model matches path.py:ContractionTree exactly:
//   inds(v)  = indices under v retained (appear outside v or in output)
//   flops(v) = prod of sizes of union(inds(left), inds(right))
//   total    = sum over internal nodes of flops(v)
// Sliced indices have zero log-weight (they are fixed, not contracted).
//
// Move: pick internal v with children (A, B), B internal = (C, D);
// propose ((A,C),D) or ((A,D),C).  Only node B changes:
//   inds(B') = (inds(A) | inds(C)) & (inds(v) | inds(D))
// (an index under B' is retained iff it reaches outside B', and outside
// B' within-the-tree means subtree D or outside v, plus the output —
// both captured by inds(v) | inds(D)).
//
// Objective: log2(total flops) + width_lambda * max(0, width - target).
// Metropolis acceptance with geometric cooling, best-tree tracking.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <set>
#include <vector>

namespace {

using std::vector;

struct Bits {
    vector<uint64_t> w;
    explicit Bits(int words = 0) : w(words, 0) {}
    void set(int i) { w[i >> 6] |= uint64_t{1} << (i & 63); }
};

inline void bits_or(const Bits& a, const Bits& b, Bits& out) {
    const size_t n = a.w.size();
    for (size_t k = 0; k < n; k++) out.w[k] = a.w[k] | b.w[k];
}

inline void bits_or_and(const Bits& a, const Bits& b, const Bits& c,
                        const Bits& d, Bits& out) {
    // out = (a | b) & (c | d)
    const size_t n = a.w.size();
    for (size_t k = 0; k < n; k++)
        out.w[k] = (a.w[k] | b.w[k]) & (c.w[k] | d.w[k]);
}

struct Tree {
    int n;                        // leaves; nodes: 2n-1 total
    vector<int> left, right, parent;
    int root;
    vector<Bits> inds;            // retained index set per node
    vector<double> logflops;      // internal-node contraction exponent
    vector<double> logsize;       // log2 size of inds(v)
    const double* lw;             // effective log-weights (sliced -> 0)
    int words;

    double weight_of(const Bits& m) const {
        double s = 0;
        for (int k = 0; k < words; k++) {
            uint64_t x = m.w[k];
            while (x) {
                const int b = __builtin_ctzll(x);
                s += lw[64 * k + b];
                x &= x - 1;
            }
        }
        return s;
    }
};

}  // namespace

extern "C" {

// Anneal a contraction tree.
//   n_tensors, n_inds: sizes
//   xinds[n_tensors+1], ind_ids[...]: leaf index lists (CSR, index ids)
//   logw[n_inds]: log2 dimension per index
//   is_out[n_inds]: 1 if the index is in the network output
//   is_sliced[n_inds]: 1 if sliced (zero effective weight)
//   ssa_in[(n_tensors-1)*2]: initial tree as SSA pairs
//   n_steps: number of sweeps (each ~ n proposals)
//   t0, t1: start/end temperature (log2-flops units), geometric decay
//   width_target, width_lambda: soft penalty on log2 max intermediate
//   seed: RNG seed
//   ssa_out: best tree found (same format)
//   out_stats[2]: {log2 total flops, log2 max size} of the best tree
// Returns 0 on success.
int tn_anneal(int n_tensors, int n_inds, const int* xinds,
              const int* ind_ids, const double* logw,
              const uint8_t* is_out, const uint8_t* is_sliced,
              const int* ssa_in, int n_steps, double t0, double t1,
              double width_target, double width_lambda, unsigned seed,
              int patience, int* ssa_out, double* out_stats) {
    if (n_tensors < 3 || n_inds <= 0) return 1;
    const int n = n_tensors, total_nodes = 2 * n - 1;
    const int words = (n_inds + 63) / 64;

    vector<double> lw_eff(n_inds);
    for (int i = 0; i < n_inds; i++)
        lw_eff[i] = is_sliced[i] ? 0.0 : logw[i];

    Tree t;
    t.n = n;
    t.words = words;
    t.lw = lw_eff.data();
    t.left.assign(total_nodes, -1);
    t.right.assign(total_nodes, -1);
    t.parent.assign(total_nodes, -1);
    t.inds.assign(total_nodes, Bits(words));
    t.logflops.assign(total_nodes, 0.0);
    t.logsize.assign(total_nodes, 0.0);

    for (int v = 0; v < n - 1; v++) {
        const int a = ssa_in[2 * v], b = ssa_in[2 * v + 1];
        const int id = n + v;
        if (a < 0 || a >= id || b < 0 || b >= id || a == b) return 2;
        t.left[id] = a;
        t.right[id] = b;
        t.parent[a] = id;
        t.parent[b] = id;
    }
    t.root = total_nodes - 1;
    for (int v = 0; v < total_nodes; v++)
        if (t.parent[v] < 0 && v != t.root) return 3;

    // Leaf union masks.
    vector<Bits> U(total_nodes, Bits(words));
    Bits out_mask(words);
    for (int i = 0; i < n_inds; i++)
        if (is_out[i]) out_mask.set(i);
    for (int v = 0; v < n; v++)
        for (int k = xinds[v]; k < xinds[v + 1]; k++) {
            if (ind_ids[k] < 0 || ind_ids[k] >= n_inds) return 4;
            U[v].set(ind_ids[k]);
        }
    for (int v = n; v < total_nodes; v++)
        bits_or(U[t.left[v]], U[t.right[v]], U[v]);

    // inds(v) = U(v) & (out_mask | U_outside(v)), top-down.
    {
        vector<Bits> uout(total_nodes, Bits(words));  // outside-union
        // root: outside union empty
        for (int v = total_nodes - 1; v >= n; v--) {
            const int l = t.left[v], r = t.right[v];
            bits_or(uout[v], U[r], uout[l]);
            bits_or(uout[v], U[l], uout[r]);
        }
        for (int v = 0; v < total_nodes; v++) {
            Bits keep(words);
            bits_or(out_mask, uout[v], keep);
            for (int k = 0; k < words; k++)
                t.inds[v].w[k] = U[v].w[k] & keep.w[k];
            t.logsize[v] = t.weight_of(t.inds[v]);
        }
    }

    auto node_flops_exp = [&](int v) {
        Bits u(words);
        bits_or(t.inds[t.left[v]], t.inds[t.right[v]], u);
        return t.weight_of(u);
    };

    double total = 0;
    std::multiset<double> sizes;
    double init_max_flops = 0;
    for (int v = n; v < total_nodes; v++) {
        t.logflops[v] = node_flops_exp(v);
        total += std::exp2(t.logflops[v]);
        init_max_flops = std::max(init_max_flops, t.logflops[v]);
    }
    for (int v = 0; v < total_nodes; v++) sizes.insert(t.logsize[v]);

    // Hard cap on proposal size: keeps the walk out of absurd regions
    // and bounds the dynamic range of `total` (incremental updates
    // would otherwise suffer catastrophic cancellation).
    const double cap = std::max(
        width_target < 1e8 ? width_target + 8.0 : 0.0,
        init_max_flops + 2.0);

    auto objective = [&](double tot, double width) {
        double o = std::log2(std::max(tot, 1.0));
        if (width > width_target) o += width_lambda * (width - width_target);
        return o;
    };

    double cur_obj = objective(total, *sizes.rbegin());

    // Best-so-far snapshot (children arrays suffice).
    vector<int> best_left(t.left), best_right(t.right);
    double best_obj = cur_obj;
    double best_flops = total, best_width = *sizes.rbegin();

    std::mt19937 rng(seed);
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    std::uniform_int_distribution<int> pick(n, total_nodes - 1);

    const double decay =
        (n_steps > 1) ? std::pow(t1 / std::max(t0, 1e-9),
                                 1.0 / (n_steps - 1))
                      : 1.0;
    double temp = t0;

    Bits newB(words), tmp(words);
    const int proposals_per_sweep = std::max(1, n - 1);

    int last_improve_sweep = 0;
    for (int sweep = 0; sweep < n_steps; sweep++, temp *= decay) {
        // Early stop: no new best for `patience` sweeps (0 = disabled).
        if (patience > 0 && sweep - last_improve_sweep > patience) break;
        // Exact resummation washes out incremental drift.
        if ((sweep & 31) == 0) {
            total = 0;
            for (int v = n; v < total_nodes; v++)
                total += std::exp2(t.logflops[v]);
            cur_obj = objective(total, *sizes.rbegin());
        }
        for (int it = 0; it < proposals_per_sweep; it++) {
            const int v = pick(rng);
            int A = t.left[v], B = t.right[v];
            if (unif(rng) < 0.5) std::swap(A, B);
            if (B < n) {
                if (A < n) continue;
                std::swap(A, B);  // ensure B internal
            }
            int C = t.left[B], D = t.right[B];
            if (unif(rng) < 0.5) std::swap(C, D);
            // propose v = ((A,C), D): B' = (A,C)
            bits_or_and(t.inds[A], t.inds[C], t.inds[v], t.inds[D],
                        newB);
            const double szB = t.weight_of(newB);
            // flops(B') = weight(inds A | inds C)
            bits_or(t.inds[A], t.inds[C], tmp);
            const double fB = t.weight_of(tmp);
            if (fB > cap) continue;
            // flops(v') = weight(inds B' | inds D)
            bits_or(newB, t.inds[D], tmp);
            const double fV = t.weight_of(tmp);
            if (fV > cap) continue;

            const double new_total = total -
                std::exp2(t.logflops[B]) - std::exp2(t.logflops[v]) +
                std::exp2(fB) + std::exp2(fV);
            // width update: replace logsize[B]
            auto itB = sizes.find(t.logsize[B]);
            sizes.erase(itB);
            sizes.insert(szB);
            const double new_obj = objective(new_total, *sizes.rbegin());

            const double d = new_obj - cur_obj;
            if (d <= 0 ||
                (temp > 0 && unif(rng) < std::exp(-d / temp))) {
                // accept: rewire  v=(B', D), B'=(A, C)
                t.left[v] = B;
                t.right[v] = D;
                t.left[B] = A;
                t.right[B] = C;
                t.parent[A] = B;
                t.parent[C] = B;
                t.parent[B] = v;
                t.parent[D] = v;
                t.inds[B] = newB;
                t.logsize[B] = szB;
                t.logflops[B] = fB;
                t.logflops[v] = fV;
                total = new_total;
                cur_obj = new_obj;
                if (cur_obj < best_obj) {
                    best_obj = cur_obj;
                    best_left = t.left;
                    best_right = t.right;
                    best_flops = total;
                    best_width = *sizes.rbegin();
                    last_improve_sweep = sweep;
                }
            } else {
                // revert width bookkeeping
                auto itN = sizes.find(szB);
                sizes.erase(itN);
                sizes.insert(t.logsize[B]);
            }
        }
    }

    // Emit best tree as SSA pairs (post-order).
    {
        vector<int> ssa_id(total_nodes, -1);
        for (int v = 0; v < n; v++) ssa_id[v] = v;
        vector<int> stack = {t.root};
        vector<int> post;
        post.reserve(n - 1);
        while (!stack.empty()) {
            const int v = stack.back();
            stack.pop_back();
            if (v < n) continue;
            post.push_back(v);
            stack.push_back(best_left[v]);
            stack.push_back(best_right[v]);
        }
        std::reverse(post.begin(), post.end());
        int next_id = n, k = 0;
        for (int v : post) {
            ssa_out[2 * k] = ssa_id[best_left[v]];
            ssa_out[2 * k + 1] = ssa_id[best_right[v]];
            if (ssa_out[2 * k] < 0 || ssa_out[2 * k + 1] < 0) return 5;
            ssa_id[v] = next_id++;
            k++;
        }
        if (k != n - 1) return 6;
    }
    if (out_stats) {
        out_stats[0] = std::log2(std::max(best_flops, 1.0));
        out_stats[1] = best_width;
    }
    return 0;
}

}  // extern "C"
