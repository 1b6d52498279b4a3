"""Graph layer: ONNX -> quantized circuit compiler (reference L3,
`/root/reference/src/graph/` — SURVEY.md §2.2)."""
