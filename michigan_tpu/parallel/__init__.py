from michigan_tpu.parallel.mesh import make_mesh, DATA_AXIS
