"""Tool-level drivers (L1-L8 of SURVEY.md §1): ingest, overlap, las
management, masking, scrubbing, graph building and touring.  Each
driver is a host-side orchestrator around the JAX kernels in
damar_tpu.ops, reading/writing the interop formats in
damar_tpu.formats."""
