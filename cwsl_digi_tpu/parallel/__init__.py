from cwsl_digi_tpu.parallel.mesh import make_mesh  # noqa: F401
