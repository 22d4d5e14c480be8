# Regenerates reference_outputs.json by running the reference's own eval
# functions (torch/transformers/tqdm stubbed). Usage: python3 generate.py
# Seed fixed at 20260816; see README.md in this directory.
