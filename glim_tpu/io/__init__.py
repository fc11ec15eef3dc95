from glim_tpu.io.loaders import load_kitti_bin, load_scan_file  # noqa: F401
