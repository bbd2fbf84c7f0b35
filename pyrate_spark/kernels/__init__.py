"""Pure-numpy per-key kernels (no Spark imports).

Each kernel is the per-key analog of one of the reference's per-pixel
routines; they run batched inside Arrow ``applyInPandas`` groups on
executors, and standalone in pytest for oracle parity.
"""
