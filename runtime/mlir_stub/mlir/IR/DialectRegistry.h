// Stand-in (see mlir_stub/mlir/IR/BuiltinOps.h for why).
#ifndef SEVENN_MLIR_STUB_DIALECT_REGISTRY_H_
#define SEVENN_MLIR_STUB_DIALECT_REGISTRY_H_
namespace mlir {
class DialectRegistry;
}  // namespace mlir
#endif
