"""Expression-level helpers shared across operators.

`bind_once` exists because of how Catalyst treats derived columns and
repeated sub-expressions:

- CollapseProject inlines a projected alias into every textual use site of
  the alias — a reference inside a higher-order-function lambda then
  re-evaluates the aliased expression on EVERY lambda iteration.
- Textual repetition inside one expression (e.g. `slice(split(s), i, n)`
  with the `split(s)` spelled out under a `transform` lambda) is likewise
  re-evaluated per iteration; common-subexpression elimination does not
  reach into lambda bodies.

Binding the sub-expression as a lambda VARIABLE fixes both: lambda
variables are evaluated once and read as values. `transform(array(X),
v -> body(v))[1]` evaluates X exactly once per row regardless of how many
times `v` appears in `body`. Measured effect: q2_ann_pq dropped 70s -> 2s
at sf0.1 when its 1024-reads-per-row encode loop stopped re-running an
inlined l2_normalize (operators/pq.py), and the shingle pipeline stopped
re-splitting the document per shingle (operators/dedup.py).
"""

from __future__ import annotations

def bind_once(bound_sql: str, body_sql: str, var: str = "nv") -> str:
    """SQL fragment evaluating ``bound_sql`` once per row, exposed to
    ``body_sql`` as the lambda variable ``var``."""
    return f"element_at(transform(array({bound_sql}), {var} -> {body_sql}), 1)"
