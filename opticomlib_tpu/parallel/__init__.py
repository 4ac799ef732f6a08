"""Multi-device runtime: meshes, sharded SSFM, halo exchange."""
