"""Reference-signature-compatible command-line entry points.

Each reference Trainer/eval script has a counterpart here with the same
positional arguments and flags (SURVEY.md §2 #7,#14,#21 and §3), plus
TPU-specific extensions (mesh shape, dtype, spectral-norm/hinge options)
behind new flags so the reference invocations keep working unchanged.
"""
