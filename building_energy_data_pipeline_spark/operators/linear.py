"""Closed-form linear models — distributed training as aggregation.

Model-based data curation (the fastText-style quality filter of
DCLM / FineWeb-Edu) needs a classifier TRAINED on a labeled slice
and SCORED over the whole corpus. For a linear model the entire
training reduces to one aggregation: the normal equations
``(XᵀX + λI) w = Xᵀy`` need only the d² Gram partials and d
moment sums — map-side-combined, exchange bounded by d², the same
shape as q143's covariance and q150's Gram fold. With d = 2
features + intercept the solve is Cramer's rule, so the WHOLE
train-then-score pipeline is two scans and zero Python: partials →
nine broadcast scalars → closed-form weights → map-only scoring
projection.

Determinism contract: partials are integer-exact sums (BIGINT
features), and the solve/score arithmetic is generated ONCE as SQL
text shared verbatim by the Spark plan and the DuckDB twin — both
engines evaluate the identical IEEE-double expression tree, so the
oracle hash pins the weights and every score.

At 100 TB: d stays tiny, so this trains in one pass regardless of
corpus size — the reason production quality filters are linear(ish)
models over cheap features. Larger d swaps Cramer for a driver-side
``numpy.linalg.solve`` on the same d² partials (q150's pattern);
the scoring projection is unchanged.
"""

from __future__ import annotations

#: ridge regularizer added to every diagonal entry (incl. the
#: intercept — documented deviation from the textbook form, which
#: leaves the intercept unpenalized; λ ≪ the Gram scale here)
RIDGE_LAMBDA = 1


def det3(m: list[str]) -> str:
    """Sarrus-rule determinant of a 3×3 of SQL scalar expressions."""
    a, b, c, d, e, f, g, h, i = m
    return (
        f"({a})*({e})*({i}) + ({b})*({f})*({g}) + ({c})*({d})*({h})"
        f" - ({c})*({e})*({g}) - ({b})*({d})*({i}) - ({a})*({f})*({h})"
    )


def ridge3_weight_exprs(lam: int = RIDGE_LAMBDA) -> dict[str, str]:
    """SQL text for the Cramer solve of ``(XᵀX + λI) w = Xᵀy`` with
    X = [1, x1, x2]. References the nine partial aliases ``n s1 s2
    s11 s12 s22 sy s1y s2y`` (DOUBLE scalars); returns ``w0 w1 w2``
    expressions shared verbatim by both engines.
    """
    A = [
        f"(n + {lam})", "s1", "s2",
        "s1", f"(s11 + {lam})", "s12",
        "s2", "s12", f"(s22 + {lam})",
    ]
    det = det3(A)

    def repl(j: int) -> list[str]:
        # replace column j with the moment vector (sy, s1y, s2y)
        b = ["sy", "s1y", "s2y"]
        out = list(A)
        out[j], out[j + 3], out[j + 6] = b[0], b[1], b[2]
        return out

    return {
        f"w{j}": f"(({det3(repl(j))}) / ({det}))" for j in range(3)
    }
