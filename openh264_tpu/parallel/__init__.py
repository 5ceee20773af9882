from .slice_parallel import (make_mesh, sliced_i_step, sliced_p_step,
                             SliceParallelEncoder)

__all__ = ["make_mesh", "sliced_i_step", "sliced_p_step",
           "SliceParallelEncoder"]
