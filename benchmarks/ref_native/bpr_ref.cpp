// Native baseline: the reference's BPR SGD kernel semantics
// (cornac/models/bpr/recom_bpr.pyx:211-269) re-expressed in plain C++ /
// OpenMP so the flagship head-to-head has a runnable same-host reference
// (this environment ships no Cython, so the reference's own extension
// cannot be built).
//
// Faithful to the reference kernel:
//  - per-thread std::mt19937 + uniform_int_distribution streams
//    (RNGVector, recom_bpr.pyx:54-62; inclusive upper bound)
//  - samples an observed (user, pos-item) pair index and a candidate
//    negative item per step; skips when the user has interacted with the
//    candidate (binary search over the sorted CSR row, recom_bpr.pyx:47-51)
//  - hogwild lock-free factor updates under an OpenMP guided-schedule
//    parallel-for (recom_bpr.pyx:231-267), same update equations
//  - RNG streams persist across epochs (RNGVector built once per fit)
//
// This file is benchmark scaffolding, NOT part of the cornac_tpu framework.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#else
static int omp_get_thread_num() { return 0; }
static int omp_get_max_threads() { return 1; }
#endif

extern "C" {

// Runs `epochs` full epochs of num_samples SGD steps each.
// Returns the total number of skipped samples (seen negatives).
long long bpr_fit_sgd(
    const int32_t* indptr,      // user CSR indptr, n_users+1
    const int32_t* item_ids,    // user CSR indices (observed items), sorted per row
    const int32_t* user_ids,    // row id per observation (COO rows), num_samples
    long long num_samples,
    long long n_items,
    float* U,                   // (n_users_total, k)
    float* V,                   // (n_items_total, k)
    float* B,                   // (n_items_total,)
    int32_t k,
    float lr,
    float reg,
    int32_t use_bias,
    uint32_t seed_pos,
    uint32_t seed_neg,
    int32_t num_threads,
    int32_t epochs)
{
    if (num_threads <= 0) num_threads = omp_get_max_threads();

    // one RNG pair per thread, seeded from two master streams like the
    // reference seeds each RNGVector entry from its numpy RandomState
    std::mt19937 master_pos(seed_pos), master_neg(seed_neg);
    std::vector<std::mt19937> rng_pos, rng_neg;
    for (int t = 0; t < num_threads; ++t) {
        rng_pos.emplace_back(master_pos());
        rng_neg.emplace_back(master_neg());
    }
    // inclusive bounds, matching uniform_int_distribution[long](0, rows)
    std::uniform_int_distribution<long long> dist_pos(0, num_samples - 1);
    std::uniform_int_distribution<long long> dist_neg(0, n_items - 1);

    long long skipped_total = 0;

    for (int e = 0; e < epochs; ++e) {
        long long skipped = 0;
#ifdef _OPENMP
#pragma omp parallel num_threads(num_threads) reduction(+ : skipped)
#endif
        {
            const int tid = omp_get_thread_num();
            std::mt19937& rp = rng_pos[tid];
            std::mt19937& rn = rng_neg[tid];
#ifdef _OPENMP
#pragma omp for schedule(guided)
#endif
            for (long long s = 0; s < num_samples; ++s) {
                const long long i_index = dist_pos(rp);
                const int32_t i_id = item_ids[i_index];
                const int32_t j_id = (int32_t)dist_neg(rn);
                const int32_t u_id = user_ids[i_index];

                // skip if the user has interacted with the candidate item
                const int32_t* lo = item_ids + indptr[u_id];
                const int32_t* hi = item_ids + indptr[u_id + 1];
                if (std::binary_search(lo, hi, j_id)) {
                    skipped += 1;
                    continue;
                }

                float* user = U + (long long)u_id * k;
                float* item_i = V + (long long)i_id * k;
                float* item_j = V + (long long)j_id * k;

                float score = B[i_id] - B[j_id];
                for (int f = 0; f < k; ++f)
                    score += user[f] * (item_i[f] - item_j[f]);
                const float z = 1.0f / (1.0f + std::exp(score));

                for (int f = 0; f < k; ++f) {
                    const float temp = user[f];
                    user[f] += lr * (z * (item_i[f] - item_j[f]) - reg * user[f]);
                    item_i[f] += lr * (z * temp - reg * item_i[f]);
                    item_j[f] += lr * (-z * temp - reg * item_j[f]);
                }
                if (use_bias) {
                    B[i_id] += lr * (z - reg * B[i_id]);
                    B[j_id] += lr * (-z - reg * B[j_id]);
                }
            }
        }
        skipped_total += skipped;
    }
    return skipped_total;
}

}  // extern "C"
