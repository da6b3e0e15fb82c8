#!/usr/bin/env python
"""hybrid-scaled at 2x budget (6000 steps, 83M): does the scaled-backward
recipe keep tracking the bf16 descent past the unscaled recipes'
convergence ceiling?  Writes the cell into ACCURACY_BUDGET.json."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from accuracy_gates import direct_recipe_gates

OUT = os.path.join(os.path.dirname(__file__), "..", "ACCURACY_BUDGET.json")
results = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        results = json.load(f)
direct_recipe_gates(6000, 32, 1e-3, results, "large",
                    recipes=(("hybrid-scaled", "fp16"),),
                    out_key="budget_scaled")
with open(OUT, "w") as f:
    json.dump(results, f, indent=1)
print("wrote", OUT)
