// Minimal stand-in for mlir/IR/BuiltinOps.h (see pjrt_cpu_host.cpp).
//
// TensorFlow's pip wheel ships the XLA/PJRT C++ headers and exports the
// symbols from libtensorflow_cc, but omits the llvm half of llvm-project's
// headers, so the real mlir headers cannot be included. The PJRT surface we
// use (GetXlaPjrtCpuClient, CompileAndLoad(XlaComputation), buffers) never
// touches mlir types; the pjrt headers only need mlir::ModuleOp to be a
// complete type for inline default implementations we never call. Name
// mangling depends only on the qualified names, so these stand-ins keep the
// ABI of every symbol we actually link against.
#ifndef SEVENN_MLIR_STUB_BUILTIN_OPS_H_
#define SEVENN_MLIR_STUB_BUILTIN_OPS_H_

namespace mlir {
class Operation;
class MLIRContext;
class ModuleOp {
 public:
  ModuleOp() : impl_(nullptr) {}
  Operation* getOperation() const { return impl_; }

 private:
  Operation* impl_;
};
template <typename OpTy>
class OwningOpRef {
 public:
  OwningOpRef() {}
  OpTy op_;
};
}  // namespace mlir

#endif
