from tpu_captioner.parallel.mesh import make_mesh, local_device_count
