// tree_anneal — simulated annealing over contraction trees (C++17).
//
// Local-rotation annealing on the binary contraction tree, the
// restructuring engine that closes the gap between partition-based
// candidate trees and state-of-the-art paths on circuit-shaped tensor
// networks (cf. cotengra's `simulated_anneal`; the reference reaches
// comparable quality through cotengra's Bayesian hyper-optimization,
// hybridq/circuit/simulation/simulation.py:920-983).
//
// Two entry points:
//   tn_anneal        — anneal a tree under fixed sliced weights;
//   tn_slice_anneal  — full slice-and-anneal descent: greedily slice
//                      the cheapest index (total-flops scored) from the
//                      largest intermediate, re-anneal, repeat until the
//                      width target is met (cotengra's slicing_reconf,
//                      reference slicing at simulation.py:1037-1076).
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
// Proposal sizes are hard-capped and the running total is exactly
// resummed periodically (incremental updates across vastly different
// magnitudes otherwise suffer catastrophic cancellation).

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
    bool get(int i) const {
        return (w[i >> 6] >> (i & 63)) & 1;
    }
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

struct Anneal {
    int n = 0;  // leaves; nodes: 2n-1
    int n_inds = 0;
    int words = 0;
    vector<int> left, right, parent;
    int root = 0;
    vector<Bits> inds;
    vector<double> logflops;   // internal nodes
    vector<double> logsize;
    vector<double> lw;         // effective per-index log2 weights
    Bits out_mask{0};
    std::multiset<double> sizes;
    double total = 0;
    std::mt19937 rng;

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

    // Build from leaf index lists + SSA pairs.  Returns 0 on success.
    int init(int n_tensors, int n_inds_, const int* xinds,
             const int* ind_ids, const double* logw,
             const uint8_t* is_out, const uint8_t* is_sliced,
             const int* ssa_in, unsigned seed) {
        n = n_tensors;
        n_inds = n_inds_;
        words = (n_inds + 63) / 64;
        rng.seed(seed);
        const int total_nodes = 2 * n - 1;
        lw.assign(n_inds, 0.0);
        for (int i = 0; i < n_inds; i++)
            lw[i] = (is_sliced && is_sliced[i]) ? 0.0 : logw[i];
        left.assign(total_nodes, -1);
        right.assign(total_nodes, -1);
        parent.assign(total_nodes, -1);
        inds.assign(total_nodes, Bits(words));
        logflops.assign(total_nodes, 0.0);
        logsize.assign(total_nodes, 0.0);
        for (int v = 0; v < n - 1; v++) {
            const int a = ssa_in[2 * v], b = ssa_in[2 * v + 1];
            const int id = n + v;
            if (a < 0 || a >= id || b < 0 || b >= id || a == b) return 2;
            left[id] = a;
            right[id] = b;
            parent[a] = id;
            parent[b] = id;
        }
        root = total_nodes - 1;
        for (int v = 0; v < total_nodes; v++)
            if (parent[v] < 0 && v != root) return 3;

        out_mask = Bits(words);
        for (int i = 0; i < n_inds; i++)
            if (is_out[i]) out_mask.set(i);
        vector<Bits> U(total_nodes, Bits(words));
        for (int v = 0; v < n; v++)
            for (int k = xinds[v]; k < xinds[v + 1]; k++) {
                if (ind_ids[k] < 0 || ind_ids[k] >= n_inds) return 4;
                U[v].set(ind_ids[k]);
            }
        for (int v = n; v < total_nodes; v++)
            bits_or(U[left[v]], U[right[v]], U[v]);
        vector<Bits> uout(total_nodes, Bits(words));
        for (int v = total_nodes - 1; v >= n; v--) {
            bits_or(uout[v], U[right[v]], uout[left[v]]);
            bits_or(uout[v], U[left[v]], uout[right[v]]);
        }
        for (int v = 0; v < total_nodes; v++) {
            Bits keep(words);
            bits_or(out_mask, uout[v], keep);
            for (int k = 0; k < words; k++)
                inds[v].w[k] = U[v].w[k] & keep.w[k];
        }
        recompute_costs();
        return 0;
    }

    double node_flops_exp(int v) const {
        Bits u(words);
        bits_or(inds[left[v]], inds[right[v]], u);
        return weight_of(u);
    }

    // Recompute logsize/logflops/total/sizes from inds + lw.
    void recompute_costs() {
        const int total_nodes = 2 * n - 1;
        sizes.clear();
        total = 0;
        for (int v = 0; v < total_nodes; v++) {
            logsize[v] = weight_of(inds[v]);
            sizes.insert(logsize[v]);
        }
        for (int v = n; v < total_nodes; v++) {
            logflops[v] = node_flops_exp(v);
            total += std::exp2(logflops[v]);
        }
    }

    double width() const { return *sizes.rbegin(); }

    double objective(double tot, double w, double width_target,
                     double width_lambda) const {
        double o = std::log2(std::max(tot, 1.0));
        if (w > width_target) o += width_lambda * (w - width_target);
        return o;
    }

    // One annealing phase; keeps the best tree *in place* (the tree is
    // left at the best state found, not the last state).
    void run(int n_steps, double t0, double t1, double width_target,
             double width_lambda, int patience) {
        const int total_nodes = 2 * n - 1;
        double init_max_flops = 0;
        for (int v = n; v < total_nodes; v++)
            init_max_flops = std::max(init_max_flops, logflops[v]);
        const double cap = std::max(
            width_target < 1e8 ? width_target + 8.0 : 0.0,
            init_max_flops + 2.0);

        double cur_obj = objective(total, width(), width_target,
                                   width_lambda);
        vector<int> best_left(left), best_right(right);
        double best_obj = cur_obj;
        bool improved_since_snapshot = false;

        std::uniform_real_distribution<double> unif(0.0, 1.0);
        std::uniform_int_distribution<int> pick(n, total_nodes - 1);
        const double decay =
            (n_steps > 1) ? std::pow(t1 / std::max(t0, 1e-9),
                                     1.0 / (n_steps - 1))
                          : 1.0;
        double temp = t0;
        Bits newB(words), tmp(words);
        const int proposals = std::max(1, n - 1);
        std::uniform_real_distribution<double> tie(0.0, 1e-12);

        int last_improve = 0;
        for (int sweep = 0; sweep < n_steps; sweep++, temp *= decay) {
            if (patience > 0 && sweep - last_improve > patience) break;
            if ((sweep & 31) == 0) {
                total = 0;
                for (int v = n; v < total_nodes; v++)
                    total += std::exp2(logflops[v]);
                cur_obj = objective(total, width(), width_target,
                                    width_lambda);
            }
            for (int it = 0; it < proposals; it++) {
                const int v = pick(rng);
                int A = left[v], B = right[v];
                if (unif(rng) < 0.5) std::swap(A, B);
                if (B < n) {
                    if (A < n) continue;
                    std::swap(A, B);
                }
                int C = left[B], D = right[B];
                if (unif(rng) < 0.5) std::swap(C, D);
                bits_or_and(inds[A], inds[C], inds[v], inds[D], newB);
                const double szB = weight_of(newB);
                bits_or(inds[A], inds[C], tmp);
                const double fB = weight_of(tmp);
                if (fB > cap) continue;
                bits_or(newB, inds[D], tmp);
                const double fV = weight_of(tmp);
                if (fV > cap) continue;

                const double new_total = total -
                    std::exp2(logflops[B]) - std::exp2(logflops[v]) +
                    std::exp2(fB) + std::exp2(fV);
                auto itB = sizes.find(logsize[B]);
                sizes.erase(itB);
                sizes.insert(szB);
                const double new_obj = objective(
                    new_total, width(), width_target, width_lambda);
                const double d = new_obj - cur_obj;
                if (d <= 0 ||
                    (temp > 0 && unif(rng) < std::exp(-d / temp))) {
                    left[v] = B;
                    right[v] = D;
                    left[B] = A;
                    right[B] = C;
                    parent[A] = B;
                    parent[C] = B;
                    parent[B] = v;
                    parent[D] = v;
                    inds[B] = newB;
                    logsize[B] = szB;
                    logflops[B] = fB;
                    logflops[v] = fV;
                    total = new_total;
                    cur_obj = new_obj;
                    if (cur_obj < best_obj - 1e-12) {
                        best_obj = cur_obj;
                        best_left = left;
                        best_right = right;
                        improved_since_snapshot = true;
                        last_improve = sweep;
                    }
                } else {
                    auto itN = sizes.find(szB);
                    sizes.erase(itN);
                    sizes.insert(logsize[B]);
                }
            }
        }
        // Restore the best tree and rebuild exact costs/ind sets.
        if (improved_since_snapshot || best_obj < cur_obj) {
            rebuild_from(best_left, best_right);
        }
    }

    // Reset structure to given children arrays; recompute inds + costs.
    void rebuild_from(const vector<int>& l, const vector<int>& r) {
        const int total_nodes = 2 * n - 1;
        left = l;
        right = r;
        for (int v = n; v < total_nodes; v++) {
            parent[left[v]] = v;
            parent[right[v]] = v;
        }
        // Recompute inds from leaves (leaf inds are invariant).
        vector<Bits> U(total_nodes, Bits(words));
        for (int v = 0; v < n; v++) U[v] = inds[v];  // leaves retained
        // NOTE: leaf inds(v) == leaf index sets (never change).
        vector<char> done(total_nodes, 0);
        // children-before-parents order via iterative post-order
        vector<int> stack = {root}, post;
        while (!stack.empty()) {
            int v = stack.back();
            stack.pop_back();
            if (v < n) continue;
            post.push_back(v);
            stack.push_back(left[v]);
            stack.push_back(right[v]);
        }
        std::reverse(post.begin(), post.end());
        for (int v : post) bits_or(U[left[v]], U[right[v]], U[v]);
        vector<Bits> uout(total_nodes, Bits(words));
        for (auto it = post.rbegin(); it != post.rend(); ++it) {
            const int v = *it;
            bits_or(uout[v], U[right[v]], uout[left[v]]);
            bits_or(uout[v], U[left[v]], uout[right[v]]);
        }
        for (int v = 0; v < total_nodes; v++) {
            Bits keep(words);
            bits_or(out_mask, uout[v], keep);
            for (int k = 0; k < words; k++)
                inds[v].w[k] = U[v].w[k] & keep.w[k];
        }
        recompute_costs();
    }

    // Emit the current tree as SSA pairs.
    int emit(int* ssa_out) const {
        const int total_nodes = 2 * n - 1;
        vector<int> ssa_id(total_nodes, -1);
        for (int v = 0; v < n; v++) ssa_id[v] = v;
        vector<int> stack = {root}, post;
        while (!stack.empty()) {
            int v = stack.back();
            stack.pop_back();
            if (v < n) continue;
            post.push_back(v);
            stack.push_back(left[v]);
            stack.push_back(right[v]);
        }
        std::reverse(post.begin(), post.end());
        int next_id = n, k = 0;
        for (int v : post) {
            ssa_out[2 * k] = ssa_id[left[v]];
            ssa_out[2 * k + 1] = ssa_id[right[v]];
            if (ssa_out[2 * k] < 0 || ssa_out[2 * k + 1] < 0) return 5;
            ssa_id[v] = next_id++;
            k++;
        }
        return (k == n - 1) ? 0 : 6;
    }

    // Greedily pick the next slice index: candidates are the non-output
    // non-sliced indices of the largest intermediate; score = total
    // flops after zeroing the index.  Returns -1 if none.
    int pick_slice(const vector<char>& sliced_flag) const {
        const int total_nodes = 2 * n - 1;
        int largest = 0;
        for (int v = 1; v < total_nodes; v++)
            if (logsize[v] > logsize[largest]) largest = v;
        double best_total = 0;
        int best = -1;
        for (int i = 0; i < n_inds; i++) {
            if (!inds[largest].get(i) || sliced_flag[i] ||
                out_mask.get(i) || lw[i] == 0.0)
                continue;
            double tot = 0;
            Bits u(words);
            for (int v = n; v < total_nodes; v++) {
                bits_or(inds[left[v]], inds[right[v]], u);
                const double f =
                    logflops[v] - (u.get(i) ? lw[i] : 0.0);
                tot += std::exp2(f);
            }
            if (best < 0 || tot < best_total) {
                best = i;
                best_total = tot;
            }
        }
        return best;
    }

    void apply_slice(int i) {
        lw[i] = 0.0;
        recompute_costs();
    }
};

}  // namespace

extern "C" {

// Anneal a contraction tree (see header comment).  out_stats[2] =
// {log2 total flops, log2 max size} of the returned tree.
int tn_anneal(int n_tensors, int n_inds, const int* xinds,
              const int* ind_ids, const double* logw,
              const uint8_t* is_out, const uint8_t* is_sliced,
              const int* ssa_in, int n_steps, double t0, double t1,
              double width_target, double width_lambda, unsigned seed,
              int patience, int* ssa_out, double* out_stats) {
    if (n_tensors < 3 || n_inds <= 0) return 1;
    Anneal a;
    int rc = a.init(n_tensors, n_inds, xinds, ind_ids, logw, is_out,
                    is_sliced, ssa_in, seed);
    if (rc) return rc;
    a.run(n_steps, t0, t1, width_target, width_lambda, patience);
    rc = a.emit(ssa_out);
    if (rc) return rc;
    if (out_stats) {
        out_stats[0] = std::log2(std::max(a.total, 1.0));
        out_stats[1] = a.width();
    }
    return 0;
}

// Slice-and-anneal descent.
//   sweeps_per_slice: annealing sweeps between consecutive slices
//   max_slices:       hard cap (error 7 if exceeded)
//   out_sliced:       n_inds flags (includes any input is_sliced)
//   out_stats[3]:     {log2 residual flops, log2 width, n_sliced}
int tn_slice_anneal(int n_tensors, int n_inds, const int* xinds,
                    const int* ind_ids, const double* logw,
                    const uint8_t* is_out, const uint8_t* is_sliced,
                    const int* ssa_in, double target_log2_width,
                    int sweeps_per_slice, int final_sweeps, double t0,
                    double t1, double width_lambda, unsigned seed,
                    int max_slices, int* ssa_out, uint8_t* out_sliced,
                    double* out_stats) {
    if (n_tensors < 3 || n_inds <= 0) return 1;
    Anneal a;
    int rc = a.init(n_tensors, n_inds, xinds, ind_ids, logw, is_out,
                    is_sliced, ssa_in, seed);
    if (rc) return rc;

    vector<char> sliced_flag(n_inds, 0);
    int n_sliced = 0;
    for (int i = 0; i < n_inds; i++)
        if (is_sliced && is_sliced[i]) sliced_flag[i] = 1;

    while (a.width() > target_log2_width + 1e-9) {
        const int i = a.pick_slice(sliced_flag);
        if (i < 0) break;  // only output legs remain oversized
        sliced_flag[i] = 1;
        n_sliced++;
        if (n_sliced > max_slices) return 7;
        a.apply_slice(i);
        a.run(sweeps_per_slice, t0, t1, target_log2_width,
              width_lambda, std::max(1000, sweeps_per_slice / 2));
    }
    if (final_sweeps > 0)
        a.run(final_sweeps, t0 / 2, t1, target_log2_width,
              width_lambda, std::max(10000, final_sweeps / 2));

    rc = a.emit(ssa_out);
    if (rc) return rc;
    for (int i = 0; i < n_inds; i++) out_sliced[i] = sliced_flag[i];
    if (out_stats) {
        out_stats[0] = std::log2(std::max(a.total, 1.0));
        out_stats[1] = a.width();
        out_stats[2] = n_sliced;
    }
    return 0;
}

}  // extern "C"
