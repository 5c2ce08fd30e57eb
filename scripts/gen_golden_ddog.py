"""Regenerate the DDOG (DataDog-original collapse) golden files in
tests/golden/.

Compiles the READ-ONLY reference DD kernels
(/root/reference/ParallelDDSketch/src/{MapSketch,ArraySketch,Merger,
Summary}.cc — compiled, never copied) into a dump harness, in BOTH build
modes (-DLowBins / -DHighBins, exactly the reference's MakeL.mk/MakeH.mk
switch), using scripts/mpi_shim/mpi.h in place of a real MPI install.

The harness replays the reference's full distributed protocol in one
process:

  1. contiguous slice decomposition across P "ranks"
  2. per-rank VALIDATION-mode fill — per-item key = ceil(log10(|x|)/base),
     B* for zeros, fence redirection through kPosi/kNega, per-item
     OriginalPairCollapse bound enforcement
     (ParallelSketcher.cc:546-648, MapSketch.cc:87-247)
  3. pack_SketchesPair serialization (Summary.cc:13)
  4. a reduceOriginal fold (Merger.cc:472-739 + optMergeBinsPosi/Nega
     :745-1472 + originalCollapseArrayPair ArraySketch.cc:212-443) in a
     recorded merge order (linear or pairwise tree)
  5. PairQuantile walks on the final global pack (ArraySketch.cc:10-79)

plus the UNIFORM-collapse pair variant: per-rank fill with the compiled
collapseUniformly (MapSketch.cc:43-83) and a reduceSketchPair fold
(Merger.cc:283-463 -> mergeBins + collapsePairToMaxCollapses
ArraySketch.cc:505-546 + collapseArrayPair :171-206).

and dumps per-slice bucket maps, the post-merge bucket arrays, and the
quantile walk results as JSON. tests/test_ddog_golden.py then asserts our
DDSketchPair (compat=True) reproduces every stage bucket-for-bucket.

Requires g++ and the reference checkout; artifacts are committed so the
test suite itself needs neither.
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "tests", "golden")
SHIM = os.path.join(HERE, "mpi_shim")
REF = "/root/reference/ParallelDDSketch/src"

_MAIN = r"""
#include "Header.h"
#include "MapSketch.h"
#include "ArraySketch.h"
#include "Merger.h"
#include "Summary.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

int Gbuffer_size = 0;   // extern consumed by Merger.cc
int pid0 = 0;           // extern consumed by MapSketch.cc

/* Keep-alive operator delete: OriginalPairCollapse reads the fence key
 * through a reverse_iterator AFTER erasing its base node
 * (MapSketch.cc:202 `*BNega = rp2->first` / :209-ish HighBins analog) —
 * a read-after-erase of an std::map node. Under the toolchain the
 * reference was developed on, the freed node's tree pointers stay intact
 * and the read deterministically yields the SURVIVING bin's key (the
 * intended fence); under modern glibc, tcache pointer mangling clobbers
 * the node's parent/color words and the same read segfaults. Making
 * map-node deallocation a no-op restores the original allocator behavior
 * so the compiled kernel reproduces the reference's de-facto semantics.
 * The C-side malloc/free paths (pack buffers, merge arrays in
 * Merger.cc/Summary.cc) do not go through operator delete and are
 * unaffected; the harness is a short-lived batch process, so the
 * leaked map nodes (~a few MB) are irrelevant. */
void operator delete(void *p) noexcept { (void)p; }
void operator delete(void *p, std::size_t) noexcept { (void)p; }
void operator delete[](void *p) noexcept { (void)p; }
void operator delete[](void *p, std::size_t) noexcept { (void)p; }

struct Local {
    std::map<int, long> posi, nega;
    int posibins = 0, negabins = 0;
    long posipop = 0, negapop = 0;
    int collapses = 0;
    int trashable = 0;
};

// Per-rank fill, VALIDATION semantics (ParallelSketcher.cc:546-648):
// signed items, B* for |x| <= NULLBOUND, fence redirection via kPosi/kNega,
// per-item OriginalPairCollapse. The LowBins/HighBins redirect direction
// follows the same #ifdef the reference main uses.
static void fill_slice(const double *v, long n, double alpha, int bound,
                       Local &L) {
    const double NCKEY = 0.75;
    double kPosi = NCKEY, kNega = NCKEY;
    double gamma = (1 + alpha) / (1 - alpha);
    double base = std::log10(gamma);
    double NULLBOUND = pow(gamma, -MIN_KEY);  // underflows to +0.0
    for (long i = 0; i < n; ++i) {
        double x = v[i];
        int key;
        if (x > NULLBOUND) {
            key = (int)std::ceil(std::log10(x) / base);
#ifdef LowBins
            if (L.collapses > 0 && kPosi != NCKEY && key < (int)kPosi) {
                key = (int)kPosi;
                ++L.trashable;
            }
#else
            if (L.collapses > 0 && kPosi != NCKEY && key > (int)kPosi) {
                key = (int)kPosi;
                ++L.trashable;
            }
#endif
            L.posibins += addKeyToSketch(L.posi, key);
            ++L.posipop;
        } else if (-NULLBOUND <= x && x <= NULLBOUND) {
            L.posibins += addKeyToSketch(L.posi, -MIN_KEY);  // B*
            ++L.posipop;
        } else {
            key = (int)std::ceil(std::log10(-x) / base);
#ifdef LowBins
            if (L.collapses > 0 && kNega != NCKEY && key > (int)kNega) {
                key = (int)kNega;
                ++L.trashable;
            }
#else
            if (L.collapses > 0 && kNega != NCKEY && key < (int)kNega) {
                key = (int)kNega;
                ++L.trashable;
            }
#endif
            L.negabins += addKeyToSketch(L.nega, key);
            ++L.negapop;
        }
        L.collapses += OriginalPairCollapse(L.posi, &L.posibins, L.nega,
                                            &L.negabins, bound, &kNega,
                                            &kPosi, NULL);
    }
}

// Per-rank fill for the UNIFORM-collapse pair variant (the reduceSketchPair
// protocol, Merger.cc:283-463). No surviving reference driver fills this
// flavor, so the fill is reconstructed from its components: per-item add at
// the CURRENT resolution (base doubles per collapse, the uddsketch.cpp:220
// convention), bound enforcement via the compiled collapseUniformly
// (MapSketch.cc:43-83) on both non-empty stores, alpha iterated as
// a' = 2a/(1+a^2) exactly like collapsePairToMaxCollapses
// (ArraySketch.cc:539). B* counts toward the bound, matching the reduce's
// own collapseArrayPair check (ArraySketch.cc:181).
static void fill_uniform(const double *v, long n, double alpha0, int bound,
                         Local &L, double *alpha_out) {
    double gamma = (1 + alpha0) / (1 - alpha0);
    double base0 = std::log10(gamma);
    double NULLBOUND = pow(gamma, -MIN_KEY);
    double base = base0;
    double alpha = alpha0;
    int key;
    for (long i = 0; i < n; ++i) {
        double x = v[i];
        if (x > NULLBOUND) {
            key = (int)std::ceil(std::log10(x) / base);
            L.posibins += addKeyToSketch(L.posi, key);
            ++L.posipop;
        } else if (-NULLBOUND <= x && x <= NULLBOUND) {
            L.posibins += addKeyToSketch(L.posi, -MIN_KEY);
            ++L.posipop;
        } else {
            key = (int)std::ceil(std::log10(-x) / base);
            L.negabins += addKeyToSketch(L.nega, key);
            ++L.negapop;
        }
        while ((L.posibins + L.negabins) > bound) {
            if (!L.posi.empty()) collapseUniformly(L.posi);
            if (!L.nega.empty()) collapseUniformly(L.nega);
            L.posibins = (int)L.posi.size();
            L.negabins = (int)L.nega.size();
            ++L.collapses;
            base *= 2.0;
            alpha = (2 * alpha) / (1 + pow(alpha, 2));
        }
    }
    *alpha_out = alpha;
}

static void dump_map(const std::map<int, long> &m, bool first_field,
                     const char *name) {
    printf("%s\"%s\": [", first_field ? "" : ", ", name);
    bool first = true;
    for (std::map<int, long>::const_iterator it = m.begin(); it != m.end();
         ++it) {
        printf("%s[%d, %ld]", first ? "" : ", ", it->first, it->second);
        first = false;
    }
    printf("]");
}

static void dump_bins(const struct Bucket *b, int n, bool first_field,
                      const char *name) {
    printf("%s\"%s\": [", first_field ? "" : ", ", name);
    for (int i = 0; i < n; ++i) {
        printf("%s[%d, %ld]", i ? "" : "", b[i].key, b[i].count);
        if (i + 1 < n) printf(", ");
    }
    printf("]");
}

int main(int argc, char **argv) {
    // argv: <values.bin> <alpha> <bound> <P> <order: linear|tree>
    //       [variant: ddog|uniform]
    if (argc != 6 && argc != 7) return 2;
    double alpha = atof(argv[2]);
    int bound = atoi(argv[3]);
    int P = atoi(argv[4]);
    bool tree = (strcmp(argv[5], "tree") == 0);
    bool uniform = (argc == 7 && strcmp(argv[6], "uniform") == 0);
    void (*reduce_fn)(void *, void *, int *, MPI_Datatype *) =
        uniform ? reduceSketchPair : reduceOriginal;

    FILE *f = fopen(argv[1], "rb");
    if (!f) return 3;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<double> vals(sz / 8);
    if (fread(vals.data(), 8, vals.size(), f) != vals.size()) return 4;
    fclose(f);

    long n = (long)vals.size();
    long base_n = n / P, rem = n % P;

    std::vector<Local> locals(P);
    std::vector<char *> packs(P);
    long off = 0;
    printf("{\"slices\": [");
    for (int p = 0; p < P; ++p) {
        long cnt = base_n + (p < rem ? 1 : 0);
        double p_alpha = alpha;
        if (uniform) {
            fill_uniform(vals.data() + off, cnt, alpha, bound, locals[p],
                         &p_alpha);
        } else {
            fill_slice(vals.data() + off, cnt, alpha, bound, locals[p]);
        }
        off += cnt;
        int size = 0;
        // DDOG packs collapses=0 (ParallelSketcher.cc:727); the uniform
        // reduce aligns on per-process collapse counts, so pack them
        packs[p] = pack_SketchesPair(
            p_alpha, uniform ? locals[p].collapses : 0, bound,
            locals[p].posi, locals[p].posibins,
            locals[p].posipop, locals[p].nega, locals[p].negabins,
            locals[p].negapop, &size);
        if (!packs[p]) return 5;
        if (Gbuffer_size && Gbuffer_size != size) return 6;
        Gbuffer_size = size;
        printf("%s{\"n\": %ld, ", p ? ", " : "", cnt);
        dump_map(locals[p].posi, true, "posi");
        dump_map(locals[p].nega, false, "nega");
        printf(", \"collapses\": %d, \"trashable\": %d, \"alpha\": %.17g}",
               locals[p].collapses, locals[p].trashable, p_alpha);
    }
    printf("], ");

    // reduceOriginal fold in the recorded order; result lands in `acc`
    char *acc;
    if (!tree) {
        // linear: acc starts at rank P-1, ranks fold in descending order
        acc = packs[P - 1];
        for (int r = P - 2; r >= 0; --r) {
            reduce_fn(packs[r], acc, &Gbuffer_size, NULL);
        }
    } else {
        // pairwise binary tree: rank i absorbs rank i+step
        for (int step = 1; step < P; step *= 2) {
            for (int i = 0; i + step < P; i += 2 * step) {
                reduce_fn(packs[i + step], packs[i], &Gbuffer_size, NULL);
            }
        }
        acc = packs[0];
    }

    struct PackedPair *fin = deserializeMsgPair(acc, Gbuffer_size);
    // NDEBUG build (matching the reference's release Makefile) drops the
    // kernel's asserts, so re-check population conservation here
    long sum = 0;
    for (int i = 0; i < fin->posibins; ++i) sum += fin->posi[i].count;
    for (int i = 0; i < fin->negabins; ++i) sum += fin->nega[i].count;
    if (sum != fin->posipop + fin->negapop || sum != n) return 7;
    printf("\"final\": {\"alpha\": %.17g, \"collapses\": %d, \"bound\": %d, "
           "\"posipop\": %ld, \"negapop\": %ld, ",
           fin->alpha, fin->collapses, fin->bound, fin->posipop, fin->negapop);
    dump_bins(fin->posi, fin->posibins, true, "posi");
    dump_bins(fin->nega, fin->negabins, false, "nega");
    printf("}, ");

    // quantile walks on the reversed-nega global view (Merger.cc:15-111)
    struct PackedPair *gp = deserializeGlobalSketchPair(acc, Gbuffer_size);
    double qs[23] = {0.001, 0.01, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3,
                     0.35,  0.4,  0.45, 0.5, 0.55, 0.6, 0.65, 0.7,
                     0.75,  0.8,  0.85, 0.9, 0.95, 0.99, 0.999};
    printf("\"quantiles\": [");
    for (int i = 0; i < 23; ++i) {
        int idx = 0;
        long bcount = 0;
        double est = PairQuantile(qs[i], gp, &idx, &bcount);
        printf("%s{\"q\": %.17g, \"est\": %.17g, \"key\": %d, \"count\": %ld}",
               i ? ", " : "", qs[i], est, idx, bcount);
    }
    printf("]}\n");
    return 0;
}
"""


def _gen_values(name: str, rng: np.random.Generator, n: int) -> np.ndarray:
    if name == "lognormal_pos":
        return rng.lognormal(2.0, 1.2, n)
    if name == "signed_mix":
        u = rng.uniform(0, 1, n)
        v = np.where(
            u < 0.60,
            rng.lognormal(1.0, 1.0, n),
            np.where(u < 0.95, -rng.lognormal(0.5, 1.5, n), 0.0),
        )
        return v
    if name == "uniform_signed":
        v = rng.uniform(-1000.0, 1000.0, n)
        v[rng.uniform(0, 1, n) < 0.02] = 0.0
        return v
    if name == "narrow_no_collapse":
        return rng.lognormal(0.0, 0.15, n)
    raise ValueError(name)


# (name, n, alpha, bound, P, seed) — bounds chosen to force collapses in
# both the per-rank fill and the reduce (except the no-collapse control)
SPECS = [
    ("lognormal_pos", 16_000, 0.001, 48, 8, 201),
    ("signed_mix", 16_000, 0.001, 64, 8, 202),
    ("uniform_signed", 12_000, 0.005, 40, 8, 203),
    ("narrow_no_collapse", 8_000, 0.001, 1024, 8, 204),
]

# (name, alpha, bound, P) for the uniform-collapse (reduceSketchPair)
# variant, reusing the value files above; bounds force several uniform
# collapses (gamma doubles each time) except the no-collapse control
UNIFORM_SPECS = [
    ("lognormal_pos", 0.005, 40, 8),
    ("signed_mix", 0.005, 48, 8),
    ("narrow_no_collapse", 0.001, 1024, 8),
]


def main() -> None:
    os.makedirs(GOLDEN, exist_ok=True)
    cases = []
    with tempfile.TemporaryDirectory() as td:
        main_cpp = os.path.join(td, "ddog_golden_main.cpp")
        with open(main_cpp, "w") as f:
            f.write(_MAIN)
        exes = {}
        for mode, flag in (("low", "-DLowBins"), ("high", "-DHighBins")):
            exe = os.path.join(td, f"ddog_golden_{mode}")
            subprocess.run(
                ["g++", "-O2", "-std=c++11", "-DNDEBUG", flag,
                 f"-I{SHIM}", f"-I{REF}", main_cpp,
                 os.path.join(REF, "MapSketch.cc"),
                 os.path.join(REF, "ArraySketch.cc"),
                 os.path.join(REF, "Merger.cc"),
                 os.path.join(REF, "Summary.cc"),
                 "-o", exe],
                check=True,
            )
            exes[mode] = exe

        for name, n, alpha, bound, P, seed in SPECS:
            rng = np.random.default_rng(seed)
            vals = _gen_values(name, rng, n).astype("<f8")
            assert np.all(np.isfinite(vals))
            # denormals would split on NULLBOUND (=0.0 by underflow) vs our
            # MIN_ADDRESSABLE zero test; none of the generators emit them
            assert not np.any((vals != 0) & (np.abs(vals) < 2.3e-308))
            bin_name = f"values_ddog_{name}.bin"
            vals.tofile(os.path.join(GOLDEN, bin_name))
            for mode in ("low", "high"):
                for order in ("linear", "tree"):
                    out = subprocess.run(
                        [exes[mode], os.path.join(GOLDEN, bin_name),
                         repr(alpha), str(bound), str(P), order],
                        check=True, capture_output=True, text=True,
                    ).stdout
                    ref = json.loads(out)
                    cases.append({
                        "name": f"{name}/{mode}/{order}",
                        "file": bin_name, "alpha": alpha, "bound": bound,
                        "P": P, "n": n, "mode": mode, "order": order, **ref,
                    })
        # uniform-collapse pair variant (reduceSketchPair): mode-independent
        # (no LowBins/HighBins ifdefs on that path), driven from the LowBins
        # binary over the value files written above
        for name, alpha, bound, P in UNIFORM_SPECS:
            bin_name = f"values_ddog_{name}.bin"
            n = next(s[1] for s in SPECS if s[0] == name)
            for order in ("linear", "tree"):
                out = subprocess.run(
                    [exes["low"], os.path.join(GOLDEN, bin_name),
                     repr(alpha), str(bound), str(P), order, "uniform"],
                    check=True, capture_output=True, text=True,
                ).stdout
                ref = json.loads(out)
                cases.append({
                    "name": f"{name}/uniform/{order}",
                    "file": bin_name, "alpha": alpha, "bound": bound,
                    "P": P, "n": n, "mode": "uniform", "order": order, **ref,
                })
    with open(os.path.join(GOLDEN, "ddog_compat.json"), "w") as f:
        json.dump({"cases": cases}, f, indent=1, sort_keys=True)
    print(f"wrote {len(cases)} DDOG golden cases to {GOLDEN}")


if __name__ == "__main__":
    main()
