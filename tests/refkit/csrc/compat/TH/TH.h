// Stand-in for <TH/TH.h> (removed from modern torch): the reference WSL
// CPU kernels include it but use nothing from it directly. It DID pull in
// <cfloat> transitively in the torch era they targeted (FLT_MAX).
#pragma once
#include <cfloat>
