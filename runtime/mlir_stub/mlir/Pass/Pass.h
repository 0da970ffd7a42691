// Stand-in (see mlir_stub/mlir/IR/BuiltinOps.h for why).
#ifndef SEVENN_MLIR_STUB_PASS_H_
#define SEVENN_MLIR_STUB_PASS_H_
#include <memory>
namespace mlir {
class Pass;
class OpPassManager;
}  // namespace mlir
#endif
