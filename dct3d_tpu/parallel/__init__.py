"""Multi-chip / multi-host scale-out: meshes, sharded encode, bitstream gather."""
