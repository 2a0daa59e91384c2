"""I/O & tooling: raw video files, RGB planar split/mix, synthetic sources, rendering."""
