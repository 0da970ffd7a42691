// Stand-in (see mlir_stub/mlir/IR/BuiltinOps.h for why). The real header
// mostly imports llvm:: names into mlir::; the pjrt declarations we compile
// against only need LogicalResult and StringRef-ish aliases to exist.
#ifndef SEVENN_MLIR_STUB_SUPPORT_LLVM_H_
#define SEVENN_MLIR_STUB_SUPPORT_LLVM_H_
#include <string_view>
namespace llvm {
class StringRef;
}  // namespace llvm
namespace mlir {
using llvm::StringRef;
class LogicalResult;
}  // namespace mlir
#endif
