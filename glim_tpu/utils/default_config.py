"""Default configuration tree.

Mirrors the key schema of the reference's config/*.json files (reference:
config/config.json, config_preprocess.json, config_sensors.json,
config_odometry_{cpu,gpu,ct}.json, config_sub_mapping_{cpu,gpu,passthrough}.json,
config_global_mapping_{cpu,gpu,pose_graph}.json, config_logging.json) so that a
user of the reference can bring their configs over unchanged.  Values are the
reference defaults; ``so_name`` keys select module implementations through
glim_tpu.utils.registry.
"""

from __future__ import annotations

DEFAULT_CONFIGS = {
    "config.json": {
        "global": {
            "config_path": "",
            "config_ros": "config_ros.json",
            "config_logging": "config_logging.json",
            "config_viewer": "config_viewer.json",
            "config_sensors": "config_sensors.json",
            "config_preprocess": "config_preprocess.json",
            "config_odometry": "config_odometry_gpu.json",
            "config_sub_mapping": "config_sub_mapping_gpu.json",
            "config_global_mapping": "config_global_mapping_gpu.json",
        }
    },
    "config_preprocess.json": {
        "preprocess": {
            "distance_near_thresh": 0.5,
            "distance_far_thresh": 100.0,
            "use_random_grid_downsampling": True,
            "downsample_resolution": 1.0,
            "random_downsample_target": 10000,
            "random_downsample_rate": 0.1,
            "enable_outlier_removal": False,
            "outlier_removal_k": 10,
            "outlier_std_mul_factor": 1.0,
            "enable_cropbox_filter": False,
            "crop_bbox_frame": "lidar",
            "crop_bbox_min": [-1.0, -1.0, -1.0],
            "crop_bbox_max": [1.0, 1.0, 1.0],
            "k_correspondences": 10,
            "num_threads": 2,
        }
    },
    "config_sensors.json": {
        "sensors": {
            "imu_acc_noise": 0.05,
            "imu_gyro_noise": 0.02,
            "imu_int_noise": 0.001,
            "imu_bias_noise": 1e-5,
            "global_shutter_lidar": False,
            "T_lidar_imu": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
            "intensity_field": "intensity",
            "ring_field": "",
            "autoconf_perpoint_times": True,
            "autoconf_prefer_frame_time": False,
            "perpoint_relative_time": True,
            "perpoint_time_scale": 1.0,
            # Camera config (used by extension modules only —
            # utils/camera.py::CameraModel; reference config_sensors.json).
            "global_shutter_camera": True,
            "image_size": [640, 480],
            "T_lidar_camera": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
            "intrinsics": [500.0, 500.0, 320.0, 240.0],
            "distortion_model": "plumb_bob",
            "distortion_coeffs": [0.0, 0.0, 0.0, 0.0, 0.0],
        }
    },
    "config_odometry_cpu.json": {
        "odometry_estimation": {
            "so_name": "libodometry_estimation_cpu.so",
            # enable_imu=false (extra over the reference) selects a
            # LiDAR-only fallback for IMU-less datasets.
            "enable_imu": True,
            "initialization_mode": "LOOSE",
            "initialization_window_size": 3.0,
            "init_pose_damping_scale": 1e10,
            "smoother_lag": 5.0,
            "use_isam2_dogleg": False,
            "isam2_relinearize_skip": 1,
            "isam2_relinearize_thresh": 0.1,
            "fix_imu_bias": False,
            "compute_covs": False,
            "registration_type": "GICP",
            "max_iterations": 8,
            "lru_thresh": 100,
            "target_downsampling_rate": 0.1,
            "ivox_resolution": 1.0,
            "ivox_min_dist": 0.1,
            "vgicp_resolution": 0.5,
            "vgicp_voxelmap_levels": 1,
            "vgicp_voxelmap_scaling_factor": 2.0,
            "validate_imu": True,
            "save_imu_rate_trajectory": True,
            "num_threads": 2,
        }
    },
    "config_odometry_gpu.json": {
        "odometry_estimation": {
            "so_name": "libodometry_estimation_gpu.so",
            "initialization_mode": "LOOSE",
            "initialization_window_size": 1.0,
            "init_pose_damping_scale": 1e10,
            "smoother_lag": 5.0,
            "use_isam2_dogleg": False,
            "isam2_relinearize_skip": 1,
            "isam2_relinearize_thresh": 0.1,
            "fix_imu_bias": False,
            "compute_covs": False,
            "voxel_resolution": 0.25,
            "voxel_resolution_max": 0.5,
            "voxel_resolution_dmin": 5.0,
            "voxel_resolution_dmax": 20.0,
            "voxelmap_levels": 2,
            "voxelmap_scaling_factor": 2.0,
            "full_connection_window_size": 2,
            "keyframe_update_strategy": "OVERLAP",
            "max_num_keyframes": 15,
            "keyframe_min_overlap": 0.01,
            "keyframe_max_overlap": 0.7,
            "keyframe_delta_trans": 2.0,
            "keyframe_delta_rot": 0.5,
            "keyframe_entropy_thresh": 0.99,
            "validate_imu": True,
            "save_imu_rate_trajectory": True,
            "num_threads": 2,
        }
    },
    "config_odometry_ct.json": {
        "odometry_estimation": {
            "so_name": "libodometry_estimation_ct.so",
            "ivox_resolution": 1.0,
            "ivox_min_points_dist": 0.1,
            "ivox_lru_thresh": 200,
            "max_correspondence_distance": 2.0,
            "location_consistency_inf_scale": 1e-3,
            "constant_velocity_inf_scale": 1e3,
            "lm_max_iterations": 8,
            "smoother_lag": 1.0,
            "use_isam2_dogleg": False,
            "isam2_relinearize_skip": 1,
            "isam2_relinearize_thresh": 0.1,
            "compute_covs": False,
            "num_threads": 4,
        }
    },
    "config_sub_mapping_cpu.json": {
        "sub_mapping": {
            "so_name": "libsub_mapping.so",
            "enable_imu": True,
            "enable_optimization": False,
            "max_num_keyframes": 15,
            "keyframe_update_strategy": "OVERLAP",
            "keyframe_update_min_points": 500,
            "keyframe_update_interval_rot": 3.14,
            "keyframe_update_interval_trans": 1.0,
            "max_keyframe_overlap": 0.6,
            "create_between_factors": False,
            "between_registration_type": "GICP",
            "registration_error_factor_type": "VGICP",
            "keyframe_randomsampling_rate": 1.0,
            "keyframe_voxel_resolution": 0.25,
            "keyframe_voxelmap_levels": 2,
            "keyframe_voxelmap_scaling_factor": 2.0,
            "submap_downsample_resolution": 0.3,
            "submap_voxel_resolution": 0.5,
        }
    },
    "config_sub_mapping_gpu.json": {
        "sub_mapping": {
            "so_name": "libsub_mapping.so",
            "enable_imu": True,
            "enable_optimization": False,
            "max_num_keyframes": 15,
            "keyframe_update_strategy": "OVERLAP",
            "keyframe_update_min_points": 500,
            "keyframe_update_interval_rot": 3.14,
            "keyframe_update_interval_trans": 1.0,
            "max_keyframe_overlap": 0.6,
            "create_between_factors": False,
            "between_registration_type": "GICP",
            "registration_error_factor_type": "VGICP_GPU",
            "keyframe_randomsampling_rate": 1.0,
            "keyframe_voxel_resolution": 0.25,
            "keyframe_voxelmap_levels": 2,
            "keyframe_voxelmap_scaling_factor": 2.0,
            "submap_downsample_resolution": 0.1,
            "submap_voxel_resolution": 0.5,
            "submap_target_num_points": 50000,
        }
    },
    "config_sub_mapping_passthrough.json": {
        "sub_mapping": {
            "so_name": "libsub_mapping_passthrough.so",
            "keyframe_update_interval_rot": 0.01,
            "keyframe_update_interval_trans": 0.1,
            "max_num_keyframes": 50,
            "max_num_voxels": -1,
            "adaptive_max_num_voxels": 2.5,
            "submap_voxel_resolution": 0.5,
            "min_dist_in_voxel": 0.2,
            "max_num_points_in_voxel": 100,
            "submap_target_num_points": 50000,
        }
    },
    "config_global_mapping_cpu.json": {
        "global_mapping": {
            "so_name": "libglobal_mapping.so",
            "enable_imu": True,
            "enable_optimization": True,
            "init_pose_damping_scale": 1e10,
            "create_between_factors": True,
            "between_registration_type": "GICP",
            "registration_error_factor_type": "VGICP",
            "randomsampling_rate": 0.2,
            "submap_voxel_resolution": 0.5,
            "submap_voxelmap_levels": 1,
            "submap_voxelmap_scaling_factor": 2.0,
            "max_implicit_loop_distance": 100.0,
            "min_implicit_loop_overlap": 0.2,
            "use_isam2_dogleg": False,
            "isam2_relinearize_skip": 1,
            "isam2_relinearize_thresh": 0.1,
        }
    },
    "config_global_mapping_gpu.json": {
        "global_mapping": {
            "so_name": "libglobal_mapping.so",
            "enable_imu": True,
            "enable_optimization": True,
            "init_pose_damping_scale": 1e10,
            "create_between_factors": False,
            "between_registration_type": "GICP",
            "registration_error_factor_type": "VGICP_GPU",
            "randomsampling_rate": 1.0,
            "submap_voxel_resolution": 0.5,
            "submap_voxel_resolution_max": 1.0,
            "submap_voxel_resolution_dmin": 5.0,
            "submap_voxel_resolution_dmax": 20.0,
            "submap_voxelmap_levels": 2,
            "submap_voxelmap_scaling_factor": 2.0,
            "max_implicit_loop_distance": 100.0,
            "min_implicit_loop_overlap": 0.2,
            "use_isam2_dogleg": False,
            "isam2_relinearize_skip": 1,
            "isam2_relinearize_thresh": 0.1,
        }
    },
    "config_global_mapping_pose_graph.json": {
        "global_mapping": {
            "so_name": "libglobal_mapping_pose_graph.so",
            "enable_optimization": True,
            "init_pose_damping_scale": 1e6,
            "registration_type": "VGICP",
            "min_travel_dist": 50.0,
            "max_neighbor_dist": 5.0,
            "min_inliear_fraction": 0.5,
            "subsample_target": 10000,
            "subsample_rate": 0.1,
            "gicp_max_correspondence_dist": 2.0,
            "vgicp_voxel_resolution": 2.0,
            "odom_factor_stddev": 1e-3,
            "loop_factor_stddev": 0.1,
            "loop_factor_robust_width": 1.0,
            "loop_candidate_buffer_size": 100,
            "loop_candidate_eval_per_thread": 2,
            "use_isam2_dogleg": False,
            "isam2_relinearize_skip": 1,
            "isam2_relinearize_thresh": 0.1,
            "num_threads": 2,
        }
    },
    "config_logging.json": {
        "logging": {
            "log_dir": "/tmp",
            "save_logs": True,
            "rotate_logs": True,
            "max_file_size_kb": 8192,
            "max_files": 10,
        }
    },
    "config_viewer.json": {
        "standard_viewer": {
            "enable": True,
            # Rendering hints (reference standard_viewer.cpp:70-100);
            # exported via StandardViewer.snapshot()["render_hints"] for
            # external renderers of the dumped clouds/trajectories.
            "default_z_range": [-2.0, 4.0],
            "point_size": 0.025,
            "point_size_metric": True,
            "point_shape_circle": True,
            "points_alpha": 1.0,
            "factors_alpha": 1.0,
            "enable_partial_rendering": False,
            "partial_rendering_budget": 1024,
            "viewer_width": 2560,
            "viewer_height": 1440,
        }
    },
    "config_ros.json": {
        "glim_ros": {
            "enable_local_mapping": True,
            "enable_global_mapping": True,
            "keep_raw_points": False,
            "imu_time_offset": 0.0,
            "points_time_offset": 0.0,
            "acc_scale": 0.0,
            "imu_frame_id": "",
            "lidar_frame_id": "",
            "base_frame_id": "",
            "odom_frame_id": "odom",
            "map_frame_id": "map",
            "publish_imu2lidar": True,
            "tf_time_offset": 1e-6,
            "extension_modules": ["libmemory_monitor.so", "libstandard_viewer.so"],
            "imu_topic": "/os_cloud_node/imu",
            "points_topic": "/os_cloud_node/points",
            "image_topic": "/image",
            "imu_qos": {"profile": "sensor_data", "depth": 1000},
            "points_qos": {"profile": "sensor_data", "depth": 10},
            "image_qos": {"profile": "sensor_data", "depth": 10},
        }
    },
}
