from asdslam_tpu.geometry import se3, sim3, camera, triangulation  # noqa: F401
