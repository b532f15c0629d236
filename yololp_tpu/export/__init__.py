from yololp_tpu.export.export import build_export_fn, export_stablehlo
