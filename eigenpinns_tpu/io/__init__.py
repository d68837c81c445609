from eigenpinns_tpu.io.vtu import write_vtu, read_vtu, save_eigenfunctions

__all__ = ["write_vtu", "read_vtu", "save_eigenfunctions"]
