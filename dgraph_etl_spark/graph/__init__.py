"""Graph traversal module: the reference's Dgraph query semantics
(SURVEY.md G1-G5) as self-joins over a (src, dst, score) edge table."""
