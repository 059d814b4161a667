// Shim (SampleFromVoxels lives in the NanoVDB.h shim).
#include "../NanoVDB.h"
