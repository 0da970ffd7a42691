// Stand-in (see mlir_stub/mlir/IR/BuiltinOps.h for why).
#ifndef SEVENN_MLIR_STUB_MLIR_CONTEXT_H_
#define SEVENN_MLIR_STUB_MLIR_CONTEXT_H_
namespace mlir {
class MLIRContext;
}  // namespace mlir
#endif
