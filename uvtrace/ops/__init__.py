from uvtrace.ops import rng, generate, intersect, traverse, accumulate, shade
