"""Fill OPTIMIZATION_r12.md's bench table from BENCH_LATEST.json
(run after the round-closing bench). One-shot doc helper."""
import json
import re

bench = json.load(open("/root/repo/BENCH_LATEST.json"))
q = bench["queries"]
nq = bench["noise_qualified"]
doc = open("/root/repo/OPTIMIZATION_r12.md").read()
for name in ["mix_doremi_weights", "mix_doremi_sample", "sim_opq_adc_topk",
             "dedup_incremental_minhash", "dedup_minhash_lsh",
             "text_excise_winnowed"]:
    tag = f"{q[name]}" + ("" if nq.get(name) else " (not noise-qualified)")
    doc = re.sub(rf"(\| {name} \| [0-9.]+ \| )TBD \|", rf"\g<1>{tag} |", doc)
doc = re.sub(r"(\| TOTAL \(83 entries\) \| 125\.242 \| )TBD \|",
             rf"\g<1>{bench['value']} ({len(q)} entries) |", doc)
open("/root/repo/OPTIMIZATION_r12.md", "w").write(doc)
print("filled:", bench["value"], {k: q[k] for k in q if k in (
    "mix_doremi_weights", "mix_doremi_sample", "sim_opq_adc_topk",
    "dedup_incremental_minhash", "dedup_minhash_lsh", "text_excise_winnowed")})
