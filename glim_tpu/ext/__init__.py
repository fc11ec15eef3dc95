"""Bundled example extension modules (the glim_ext ecosystem analogue).

The reference keeps proof-of-concept extensions in a sibling repository
(koide3/glim_ext: ScanContext loop detector, DBoW image loop detector,
GNSS constraints, velocity suppressor, IMU calibration validator, ...)
wired purely through the global callback slots. Here: ``scan_context``,
``image_loop``, ``gnss_global``, ``velocity_suppressor`` (plus
``common/imu_validation.py`` and ``ros/rviz_viewer.py``). These modules play the same role here — decoupled from the
pipeline, communicating only via ``glim_tpu``'s callback/request slots —
and double as working examples of the extension surface (docs/extend.md).

Load via the ``extension_modules`` config list, e.g.
``"glim_tpu.ext.scan_context:create_extension_module"``.
"""
