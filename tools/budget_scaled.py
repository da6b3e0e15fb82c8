#!/usr/bin/env python
"""Extended-budget training cells at 83M (ACCURACY_BUDGET.json).

Parameterized single-cell runner over ``direct_recipe_gates`` (recipes /
steps / output key as flags).  The r5 headline use is the MECHANISM cell
(VERDICT r4 next #9): ``hybrid-no-normres`` — the reference's full
whole-whitelist hybrid scoping EXCEPT the norm/residual/aggregate
activation-gradient casts — run through the corpus's 3000-6000 phase
transition.  The r4 role ablation *implied* those streams block
late-phase optimization (hybrid-gemm avoids them and crosses the
transition); this cell tests the causal claim directly with everything
else still quantized.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from accuracy_gates import direct_recipe_gates

OUT = os.path.join(os.path.dirname(__file__), "..", "ACCURACY_BUDGET.json")

ap = argparse.ArgumentParser()
ap.add_argument("--recipes", default="hybrid-scaled",
                help="comma-separated algo[:master] cells "
                     "(master defaults to fp16)")
ap.add_argument("--steps", type=int, default=6000)
ap.add_argument("--lr", type=float, default=1e-3)
ap.add_argument("--batch", type=int, default=32)
ap.add_argument("--model", default="large")
ap.add_argument("--out_key", default="budget_scaled")
ap.add_argument("--out", default=OUT)
args = ap.parse_args()
OUT = args.out

recipes = tuple(
    (r.split(":")[0], r.split(":")[1] if ":" in r else "fp16")
    for r in args.recipes.split(",") if r)

results = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        results = json.load(f)
direct_recipe_gates(args.steps, args.batch, args.lr, results, args.model,
                    recipes=recipes, out_key=args.out_key)
with open(OUT, "w") as f:
    json.dump(results, f, indent=1)
print("wrote", OUT)
