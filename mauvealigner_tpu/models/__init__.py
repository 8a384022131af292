"""L5/L7: aligner pipelines (the framework's "model families").

  aligner.py      — MauveAligner: unique multi-MUM anchoring + LCBs + gapped
                    closure (src/mauveAligner.cpp doAlignment)
  progressive.py  — ProgressiveAligner: guide tree + sum-of-pairs anchoring +
                    homology HMM backbone (src/progressiveMauve.cpp)
  repeatoire.py   — chained local multiple alignment of repeats
                    (src/repeatoire.cpp)
  lcb.py          — LCB determination / greedy breakpoint elimination
"""
