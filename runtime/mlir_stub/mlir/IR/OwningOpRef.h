// Stand-in (see mlir_stub/mlir/IR/BuiltinOps.h for why).
#ifndef SEVENN_MLIR_STUB_OWNING_OP_REF_H_
#define SEVENN_MLIR_STUB_OWNING_OP_REF_H_
#include "mlir/IR/BuiltinOps.h"
#endif
